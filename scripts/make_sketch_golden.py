"""Golden-table generator for the two remaining sketch surfaces
(VERDICT r4 item 5): INDEPENDENT scalar second implementations of

- ``events_user_hll``   — HyperLogLog distinct users per event type
- ``price_quantiles_sketch`` — bottom-k-sample grouped quantiles

Both engine outputs are DETERMINISTIC functions of the input (HLL
registers max-merge commutes; the bottom-k sample is selected by a
content-derived priority, not by batch boundaries), so a golden table is
a legitimate conformance oracle — the reference's cross-implementation
discipline (json-sick-csharp/SickSharp.Test/SickTests.cs:202-204: each
side reads the other's binaries).

This script recomputes the results with deliberately different per-row
scalar code: pure-Python splitmix64 over python ints (the engine runs
vectorized numpy uint64 wraparound), a python-int count-leading-zeros
loop (the engine runs a branchless vectorized ladder), sequential
math.fsum register folding (the engine uses numpy pairwise summation),
and a per-group python quantile interpolation (the engine uses one
segmented numpy kernel across groups). Only the published algorithm
CONSTANTS are shared.

The script asserts that the scalar results equal the engine's current
output at every scale before writing, so a regeneration can never mint
a golden that silently disagrees with the engine it is meant to check.

Run: python scripts/make_sketch_golden.py
     (rewrites tests/golden/sketch_hll_golden.parquet and
      tests/golden/sketch_pq_golden.parquet)

(third sketch surface, top_terms_mg: no golden needed — the synthetic
corpus vocabulary [31 terms] is far below the 4096-counter cap, so MG
never compresses and the output provably equals the exact top-20; it
shares SQL_TOP_TERMS, with the compression regime pytest-gated.)
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT_HLL = os.path.join(REPO, "tests/golden/sketch_hll_golden.parquet")
OUT_PQ = os.path.join(REPO, "tests/golden/sketch_pq_golden.parquet")

MASK = (1 << 64) - 1
# splitmix64 finalizer constants (public: Steele et al. / xxhash avalanche)
MIX1 = 0xFF51AFD7ED558CCD
MIX2 = 0xC4CEB9FE1A85EC53
POLY = 0x9E3779B185EBCA87


def smix64(x: int) -> int:
    x &= MASK
    x ^= x >> 33
    x = (x * MIX1) & MASK
    x ^= x >> 33
    x = (x * MIX2) & MASK
    return x ^ (x >> 33)


def clz64_scalar(x: int) -> int:
    return 64 - x.bit_length()  # 64 for x == 0


# ------------------------------------------------------------------- HLL

def hll_scalar(rows, p: int = 14) -> dict[str, int]:
    """event rows (event_type, user_id) -> {event_type: estimate}."""
    m = 1 << p
    regs: dict[str, list[int]] = {}
    for et, uid in rows:
        h = smix64(uid & MASK)
        idx = h >> (64 - p)
        w = (h << p) & MASK
        rho = min(clz64_scalar(w) + 1, 64 - p + 1)
        r = regs.setdefault(et, [0] * m)
        if rho > r[idx]:
            r[idx] = rho
    out = {}
    alpha = 0.7213 / (1.0 + 1.079 / m)
    for et, r in regs.items():
        e = alpha * m * m / math.fsum(2.0 ** -x for x in r)
        if e <= 2.5 * m:
            v = r.count(0)
            if v:
                e = m * math.log(m / v)
        out[et] = int(round(e))
    return out


# ------------------------------------------- bottom-k grouped quantiles

QS = (0.25, 0.50, 0.75, 0.95)
NAMES = ("p25", "p50", "p75", "p95")


def pq_scalar(rows, k: int = 4096) -> dict[str, dict[str, float]]:
    """lineitem rows (ok, ln, flag, price) -> {flag: {p25..p95}}."""
    per: dict[str, list[tuple[int, float]]] = {}
    for ok, ln, flag, price in rows:
        u = smix64((ok * POLY + ln) & MASK)
        if u >= 1 << 63:
            u -= 1 << 64                      # engine views priorities int64
        per.setdefault(flag, []).append((u, float(price)))
    out = {}
    for flag, lst in per.items():
        lst.sort()                            # by priority
        sample = sorted(price for _u, price in lst[:k])
        n = len(sample)
        vals = {}
        for q, nm in zip(QS, NAMES):
            pos = q * (n - 1)
            lo = int(pos)
            hi = min(lo + 1, n - 1)
            frac = pos - lo
            vals[nm] = round(sample[lo] + (sample[hi] - sample[lo]) * frac, 4)
        out[flag] = vals
    return out


def main() -> None:
    import ray

    from sick_ray.pipelines.queries import (q_events_user_hll,
                                            q_price_quantiles_sketch)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    hll_rows = {c: [] for c in ("sf", "event_type", "approx_users")}
    pq_rows = {c: [] for c in ("sf", "l_returnflag", *NAMES)}
    for sf_dir in SF_DIRS:
        key = os.path.basename(sf_dir)

        ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "user_id"])
        golden = hll_scalar(zip(ev.column("event_type").to_pylist(),
                                ev.column("user_id").to_pylist()))
        eng = {r["event_type"]: r["approx_users"]
               for r in q_events_user_hll(sf_dir).to_pandas().to_dict("records")}
        assert eng == golden, (key, "hll scalar/engine disagree", eng, golden)
        for et in sorted(golden):
            hll_rows["sf"].append(key)
            hll_rows["event_type"].append(et)
            hll_rows["approx_users"].append(golden[et])

        li = pq.read_table(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_returnflag",
                     "l_extendedprice"])
        golden_q = pq_scalar(zip(li.column("l_orderkey").to_pylist(),
                                 li.column("l_linenumber").to_pylist(),
                                 li.column("l_returnflag").to_pylist(),
                                 li.column("l_extendedprice").to_pylist()))
        eng_q = {r["l_returnflag"]: {nm: r[nm] for nm in NAMES}
                 for r in q_price_quantiles_sketch(sf_dir)
                 .to_pandas().to_dict("records")}
        assert eng_q == golden_q, (key, "pq scalar/engine disagree",
                                   eng_q, golden_q)
        for flag in sorted(golden_q):
            pq_rows["sf"].append(key)
            pq_rows["l_returnflag"].append(flag)
            for nm in NAMES:
                pq_rows[nm].append(golden_q[flag][nm])
        print(f"{key}: hll {len(golden)} types, pq {len(golden_q)} flags — "
              "scalar == engine")

    pq.write_table(pa.table(hll_rows), OUT_HLL)
    pq.write_table(pa.table(pq_rows), OUT_PQ)
    print("wrote", OUT_HLL, "and", OUT_PQ)
    ray.shutdown()


if __name__ == "__main__":
    main()
