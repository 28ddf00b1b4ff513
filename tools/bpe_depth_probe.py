#!/usr/bin/env python
"""BPE merge-depth appendix (VERDICT r14 #4, "Missing" #3): measure the
driver-side merge loop's per-round cost DEEP into the merge schedule —
the registered queries train 64 merges (BPE_TRAIN_ROUNDS, hashes
untouched by this probe); production tokenizers train 30k+.  The
architecture claim to verify: after the one distributed vocab collect,
each merge round is a pure dict pass whose cost tracks |vocab| (slowly
shrinking), NOT the merge index — i.e. per-round cost stays ~flat, so
depth is a linear multiplier, not a blow-up.

The probe collects the sf0.1 vocabulary once (timed), then runs the
exact `_bpe_train_plan` merge-loop body up to --rounds (default 1024)
rounds, timing every round, and writes SCALE_BPE.json with the collect
wall, per-round wall summarized per 64-round block, and the
flatness ratio (last block mean / first block mean).  If the corpus's
pair space exhausts before --rounds (finite vocab => finite merges),
the probe records the exhaustion round — that IS the measured behavior
at this SF, and the per-round trend up to exhaustion carries the claim.

Usage: python tools/bpe_depth_probe.py [--rounds N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = 1024
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    from pyspark.sql import SparkSession

    from mini_hadoop_spark.operators.compression import _bpe_vocab_plan

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("bpe-depth-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    rows = [(r.s, int(r.cnt)) for r in _bpe_vocab_plan(spark, sf_dir).collect()]
    collect_s = time.perf_counter() - t0

    # the exact merge-loop body from compression._bpe_train_plan,
    # instrumented per round (kept in lock-step with the operator; the
    # operator itself stays at BPE_TRAIN_ROUNDS=64 so query hashes are
    # untouched)
    vocab = dict(rows)
    per_round: list[float] = []
    exhausted_at = None
    for rnd in range(1, rounds + 1):
        r0 = time.perf_counter()
        pairs: dict[tuple[str, str], int] = {}
        for s, cnt in vocab.items():
            syms = s[1:-1].split("><")
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                pairs[key] = pairs.get(key, 0) + cnt
        if not pairs:
            exhausted_at = rnd
            break
        (a, b) = min(pairs, key=lambda k: (-pairs[k], k))
        nxt: dict[str, int] = {}
        for s, c in vocab.items():
            m = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
            nxt[m] = nxt.get(m, 0) + c
        vocab = nxt
        per_round.append(time.perf_counter() - r0)

    n = len(per_round)
    block = 64
    blocks = [
        {
            "rounds": f"{i + 1}-{min(i + block, n)}",
            "mean_ms": round(sum(per_round[i : i + block]) / len(per_round[i : i + block]) * 1000, 3),
            "max_ms": round(max(per_round[i : i + block]) * 1000, 3),
        }
        for i in range(0, n, block)
    ]
    flatness = (
        round(blocks[-1]["mean_ms"] / blocks[0]["mean_ms"], 3) if len(blocks) > 1 else None
    )
    out = {
        "sf_dir": sf_dir,
        "vocab_rows": len(rows),
        "vocab_collect_s": round(collect_s, 3),
        "rounds_requested": rounds,
        "rounds_completed": n,
        "pair_space_exhausted_at": exhausted_at,
        "per_round_ms_blocks": blocks,
        "last_over_first_block_ratio": flatness,
        "total_merge_loop_s": round(sum(per_round), 3),
    }
    path = os.path.join(root, "SCALE_BPE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
