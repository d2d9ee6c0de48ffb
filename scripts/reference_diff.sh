#!/bin/bash
# Cross-binary differential: compile the reference krep (out-of-tree — the
# reference dir is read-only), run it over generated corpora for the case
# list shared with graft.bench.ReferenceDiff, then have the Spark
# expressions compute the same counts and compare exactly.
# Usage: scripts/reference_diff.sh [workDir]
set -eu
REF=${KREP_REF:-/root/reference}
WORK=${1:-/tmp/krep_diff}
BUILD=/tmp/krep-build
cd "$(dirname "$0")/.."

if ! command -v gcc >/dev/null; then
  echo "reference_diff: gcc unavailable — skipping"; exit 0
fi
if [ ! -f "$REF/krep.c" ]; then
  echo "reference_diff: reference source not found at $REF — skipping"; exit 0
fi
if [ ! -x "$BUILD/krep" ]; then
  rm -rf "$BUILD"; cp -r "$REF" "$BUILD"
  make -C "$BUILD" >/dev/null
fi
K="$BUILD/krep"

rm -rf "$WORK"; mkdir -p "$WORK/inputs"
python3 - "$WORK/inputs" <<'EOF'
import random, sys, os
out = sys.argv[1]
rng = random.Random(4242)
words = ["aa","aaa","aaaa","ab","ba","bab","baab","The","the","THE","Thorn",
         "athe","xyz","a","b","cab","abab","Aa","aA","the.","(aa)","café",
         "wort","Theory","lathe","AB","anna","naan"]
for fi in range(12):
    lines = []
    for _ in range(rng.randint(25, 70)):
        n = rng.randint(0, 9)
        lines.append(" ".join(rng.choice(words) for _ in range(n)))
    lines.append("a" * rng.randint(100, 400) + "b")  # long overlap stress
    with open(os.path.join(out, f"f{fi:02d}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
open(os.path.join(out, "empty.txt"), "w").close()
# CRLF-bearing file: POSIX REG_NEWLINE recognizes only '\n', so a line's
# content includes the '\r' — 'b$' must NOT match "...b\r\n"; pins the
# engine's UNIX_LINES flag choice against the binary
with open(os.path.join(out, "crlf.txt"), "w", newline="") as f:
    f.write("aa b\r\nThe ab\r\naa aa\nb\r\nempty\r\n\r\nb\n")
# dense overlap + punctuation-only + blank-heavy file
with open(os.path.join(out, "dense.txt"), "w") as f:
    f.write("aaaaaaaaaaaa\n...((aa))...\n\n\n" + "ababab " * 30 + "\n"
            + "aA" * 50 + "\n. , ; :\nThe\n")
EOF

# caseId <-> krep flags; the Spark twin lives in ReferenceDiff.cases
declare -A FLAGS=(
  [c_aa]="-c aa"           [c_ab]="-c ab"          [c_The]="-c The"
  [c_zz]="-c zz"           [ci_aa]="-ci aa"        [ci_The]="-ci The"
  [cw_aa]="-cw aa"         [cw_The]="-cw The"      [cm]="-c -e aa -e ba"
  [cre1]="-cE a+b?"        [cre2]="-cE [A-Z][a-z]+"
  [co_aa]="-co aa"         [co_ab]="-co ab"        [co_The]="-co The"
  [cow_aa]="-cow aa"       [coi_aa]="-coi aa"      [com]="-co -e aa -e ba"
  [core1]="-coE a+b?"      [core2]="-coE [A-Z][a-z]+"
  [c_anch1]="-cE ^a"       [c_anch2]="-cE b\$"     [c_empty]="-cE ^\$"
  [co_anch1]="-coE ^a"     [co_anch2]="-coE b\$"   [co_empty]="-coE ^\$"
  [co_star]="-coE xy*"
  [c_par]="-c (aa)"        [co_par]="-co (aa)"
  [c_dot]="-c the."        [co_dot]="-co the."
  [cm2]="-c -m 2 aa"       [com2]="-co -m 2 aa"
  [c_wre]="-cwE [a-z]+"    [co_wre]="-cowE [a-z]+"
  [c_ac]="-c -f PATFILE"   [co_ac]="-co -f PATFILE"
)

# only-matching cases: full (line, match) sequences, not just counts.
# o_ci pins --algo=bm: the reference's DEFAULT case-insensitive -o kernel
# has a content-dependent miss (repro: `printf 'wort The\n' | krep -oi The`
# finds nothing, while the same binary's -ci counts the line and its
# forced bm/kmp kernels both print the match) — we compare against the
# reference's self-consistent kernel, not its bug.
declare -A OFLAGS=(
  [o_lit]="-o aa"          [o_ci]="--algo=bm -oi The"
  [o_re]="-oE [A-Z][a-z]+" [o_mp]="-o -e aa -e ba"
  [o_ac]="-o -f PATFILE"
)

# 20-pattern file: forces the reference's Aho-Corasick path (and ours);
# list shared verbatim with ReferenceDiff.acPatterns
PATFILE="$WORK/patterns.txt"
printf '%s\n' aa ab ba The the cab ort wor xyz ann naan to hor ry at ea rn ab.c Aa b > "$PATFILE"

EXPECTED="$WORK/expected.tsv"; : > "$EXPECTED"
mkdir -p "$WORK/omatch"
for f in "$WORK"/inputs/*.txt; do
  base=$(basename "$f")
  for id in "${!FLAGS[@]}"; do
    flags=${FLAGS[$id]//PATFILE/$PATFILE}
    # subshell noglob: patterns like 'xy*'/'(aa)' are krep args, not globs
    # shellcheck disable=SC2086
    n=$(set -f; "$K" $flags "$f" 2>/dev/null | awk -F: '{print $NF}')
    [ -n "$n" ] || n=0
    printf '%s\t%s\t%s\n' "$id" "$base" "$n" >> "$EXPECTED"
  done
  for id in "${!OFLAGS[@]}"; do
    oflags=${OFLAGS[$id]//PATFILE/$PATFILE}
    # line:match pairs, sorted (the reference prints match order; our
    # extract sorts by offset — compare as sorted multisets)
    # shellcheck disable=SC2086
    # LC_ALL=C: the Scala side sorts by UTF-16 code units; a non-C locale
    # collates "line:match" strings differently and fabricates O-MISMATCHes.
    # cut -f2-: a match containing ':' must survive intact (awk '$2":"$3'
    # truncated it at the next colon).
    (set -f; "$K" --color=never $oflags "$f" 2>/dev/null \
      | cut -d: -f2- | LC_ALL=C sort) > "$WORK/omatch/${id}__${base}"
  done
done
echo "reference_diff: expected counts at $EXPECTED ($(wc -l < "$EXPECTED") rows)"

sbt -batch "runMain graft.bench.ReferenceDiff $WORK/inputs $EXPECTED" 2>/dev/null \
  | grep -E "MISMATCH|MISSING|reference-diff"
