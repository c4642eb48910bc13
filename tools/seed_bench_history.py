#!/usr/bin/env python3
"""Regenerate BENCH_HISTORY.jsonl from the per-round BENCH_r*.json
records (the driver's captured-stdout wrappers).

The bench's drift detector compares each run against the BEST recorded
seconds per query across this history; the file is normally maintained
by graft.Bench itself (one appended line per full suite run), and this
tool exists to rebuild the seed from the permanent round records if the
file is ever lost. Only the compact `{"metric":"total",...}` line is
parsed — per-query seconds, the ms serving metrics (stored as seconds
under their own keys), noise_floor, and tree provenance.

Usage: python3 tools/seed_bench_history.py [repo_dir] > BENCH_HISTORY.jsonl
"""
import json
import re
import glob
import sys


def extract(path):
    d = json.load(open(path))
    rnd = re.search(r"BENCH_r(\d+)", path).group(1)
    best = d.get("parsed")
    if not best:
        tail = d.get("tail", "")
        idx = tail.rfind('{"metric":"total"')
        if idx >= 0:
            frag = tail[idx:]
            end = frag.rfind("}")
            while end > 0:
                try:
                    best = json.loads(frag[: end + 1])
                    break
                except json.JSONDecodeError:
                    end = frag.rfind("}", 0, end)
    if not best or "queries" not in best:
        return None
    queries = {
        k: round(v, 4)
        for k, v in best["queries"].items()
        if isinstance(v, (int, float)) and v > 0
    }
    for mk in (
        "serving_ms_p50",
        "serving_warm_ms_p50",
        "routed_ms_p50",
        "routed_warm_ms_p50",
        "sketch_rollup_ms_p50",
    ):
        v = best.get(mk)
        if isinstance(v, (int, float)) and v > 0:
            queries[mk] = round(v / 1000.0, 4)
    return {
        "ts": best.get("run_ts", f"round-{rnd}"),
        "tree_hash": best.get("tree_hash", "unknown"),
        # sf tag (r14): history readers keep only lines at their own
        # scale factor; driver round records all run at sf0.1
        "sf": best.get("sf", "/root/testdata/sf0.1"),
        "noise_floor": best.get("noise_floor", -1.0),
        "src": f"BENCH_r{rnd}",
        "queries": queries,
    }


def main():
    repo = sys.argv[1] if len(sys.argv) > 1 else "."
    for f in sorted(glob.glob(f"{repo}/BENCH_r*.json")):
        entry = extract(f)
        if entry:
            print(json.dumps(entry, separators=(",", ":")))


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
