#!/usr/bin/env python3
"""Parse a scaling_pair.sh output log and apply the BENCH.md validity rule.

A pair block looks like:
  === pair start <ts> nDocs=N N=n ===
  {probe json}            # pre-4N bookend (pair aborts here if not quiet)
  {level json, 4N}
  {probe json}            # mid
  {level json, N}
  {probe json}            # post bookend
  === pair done <ts> ===

Validity rule (pre-stated, BENCH.md round 4): ALL bookend probes quiet
(steal < 10 ticks/s AND membw swing < 10%) AND each leg's self-reported
in-leg steal_ticks_per_sec < 10.
"""
import json, sys

def main(path):
    pairs, cur = [], None
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] "):  # sbt log prefix on JSON lines
            line = line[len("[info] "):]
        if line.startswith("=== pair start"):
            cur = {"probes": [], "levels": [], "hdr": line}
        elif line.startswith("=== pair done"):
            if cur is not None:
                cur["complete"] = True
                pairs.append(cur)
            cur = None
        elif line.startswith("{") and cur is not None:
            try:
                j = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "quiet" in j:
                cur["probes"].append(j)
            elif "level" in j:
                cur["levels"].append(j)
        elif "aborting" in line and cur is not None:
            cur = None  # probe-gated out before any leg ran

    builds_hi, builds_lo, qps_hi, qps_lo = [], [], [], []
    for i, p in enumerate(pairs, 1):
        if not p.get("complete") or len(p["levels"]) != 2:
            print(f"pair {i}: incomplete INVALID")
            continue
        hi, lo = p["levels"]
        if hi["level"] < lo["level"]:
            hi, lo = lo, hi
        probes_ok = all(pr.get("quiet") for pr in p["probes"]) and len(p["probes"]) == 3
        legs_ok = all(0 <= lv["steal_ticks_per_sec"] < 10 for lv in p["levels"])
        ck_ok = hi["checksum"] == lo["checksum"]
        beff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
        qeff = hi["qps"] / (4 * lo["qps"]) if "qps" in hi else \
               hi["queries_per_sec"] / (4 * lo["queries_per_sec"])
        why = []
        if not probes_ok: why.append("probe")
        if not legs_ok: why.append(f"in-leg steal {hi['steal_ticks_per_sec']}/{lo['steal_ticks_per_sec']}")
        if not ck_ok: why.append("CHECKSUM MISMATCH")
        tag = "VALID" if not why else "invalid(" + ",".join(why) + ")"
        print(f"pair {i}: build_eff={beff:.3f} query_eff={qeff:.3f} "
              f"ck={hi['checksum']} 4N_build={hi['index_build_sec']:.1f}s "
              f"N_build={lo['index_build_sec']:.1f}s {tag}" + (" VALID" if tag == "VALID" else ""))
        if tag == "VALID":
            builds_hi.append(hi["docs_per_sec"]); builds_lo.append(lo["docs_per_sec"])
            qps_hi.append(hi.get("qps", hi.get("queries_per_sec")))
            qps_lo.append(lo.get("qps", lo.get("queries_per_sec")))
    if builds_hi:
        n = len(builds_hi)
        pb = (sum(builds_hi)/n) / (4 * sum(builds_lo)/n)
        pq = (sum(qps_hi)/n) / (4 * sum(qps_lo)/n)
        print(f"POOLED over {n} valid pairs: build_eff={pb:.3f} query_eff={pq:.3f}")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5_scaling.jsonl")
