#!/bin/bash
# Differential of recursive-walk pruning (builtin skip lists + gitignore
# chain) vs the reference binary: generate a tree, let `krep -r --gitignore`
# report which files it searched, and have graft.bench.PruneDiff reproduce
# the keep/skip decisions through the Spark expressions.
# Usage: scripts/reference_prune_diff.sh [workDir]
set -eu
REF=${KREP_REF:-/root/reference}
WORK=${1:-/tmp/krep_prune_diff}
BUILD=/tmp/krep-build
cd "$(dirname "$0")/.."

command -v gcc >/dev/null || { echo "prune_diff: gcc unavailable — skipping"; exit 0; }
[ -f "$REF/krep.c" ] || { echo "prune_diff: no reference source — skipping"; exit 0; }
if [ ! -x "$BUILD/krep" ]; then
  rm -rf "$BUILD"; cp -r "$REF" "$BUILD"; make -C "$BUILD" >/dev/null
fi
K="$BUILD/krep"

rm -rf "$WORK"; mkdir -p "$WORK"
T="$WORK/tree"
python3 - "$T" <<'EOF'
import os, sys
t = sys.argv[1]
def put(rel, content="some text with e\n"):
    p = os.path.join(t, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f: f.write(content)
# root .gitignore: star, negation, dir-only, '?', char class, bare name —
# plus slash-containing patterns, which the reference fnmatches against the
# BASENAME and therefore never match ('/rooted.txt' and 'pair/inner.txt'
# must all be KEPT; real git would anchor them — the reference is the spec)
put(".gitignore", "*.out\n!keep.out\nout/\nsec?.txt\n[ab]*.md\ndeep\n/rooted.txt\npair/inner.txt\n")
# kept at root
put("main.c"); put("notes.txt"); put("keep.out"); put("gamma.md"); put("secXY.txt")
# slash-pattern targets: every one is kept by the reference's basename fnmatch
put("rooted.txt"); put("pair/inner.txt"); put("pair/rooted.txt")
# gitignored at root
put("a.out"); put("sec1.txt"); put("alpha.md"); put("beta.md")
# dir-only pattern + bare-name dir pattern prune subtrees
put("out/inside.c"); put("deep/nested.c"); put("deep/sub/more.c")
# builtin skip dirs and extensions
put(".git/conf.c"); put("node_modules/m.c"); put("build/b.c")
put("obj.o"); put("pic.png"); put("data.dat"); put("trace.log")
# nested .gitignore: child patterns override parents (negation across levels)
put("sub/.gitignore", "*.c\n!main.c\n")
put("sub/main.c"); put("sub/other.c"); put("sub/readme.md"); put("sub/alpha.md")
put("sub/inner/x.c"); put("sub/inner/main.c")  # chain reaches grandchildren
EOF

# every generated file contains 'e'; with -t 1 the printed per-file counts
# enumerate exactly the files the walk searched
(cd "$WORK" && "$K" -r --gitignore -t 1 -c e tree 2>/dev/null \
  | awk -F: '{print $1}' | sed 's|^tree/||' | sort) > "$WORK/ref_kept.txt"
echo "prune_diff: reference searched $(wc -l < "$WORK/ref_kept.txt") files"

sbt -batch "runMain graft.bench.PruneDiff $T $WORK/ref_kept.txt" 2>/dev/null \
  | grep -E "OURS-ONLY|REF-ONLY|prune-diff"
