"""Generate OPERATORS.md — the full query inventory with oracle status.

Run: python tools/gen_operators_md.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vena_etl_tool_spark.registry import all_specs

# One-line why for every deliberately oracle-free query (VERDICT r4 #5).
# Kept in lockstep with the registry: main() fails if this dict and the
# rows-only set diverge, so a new oracle-less query can't land unexplained.
ROWS_ONLY_WHY = {
    "agg_approx_distinct": (
        "HLL++ estimates are engine-specific register math; the exact-count "
        "twin `agg_distinct_counts` is oracle-checked and the estimate-vs-"
        "exact error bound is unit-tested"
    ),
    "agg_approx_quantile": (
        "Greenwald-Khanna sketch output has no DuckDB equivalent; the exact-"
        "percentile twin `agg_percentiles_exact` is oracle-checked"
    ),
    "agg_hll_sketch_rollup": (
        "DataSketches HLL register state is engine-specific by construction "
        "(the point is persisting mergeable sketch STATE); estimate accuracy "
        "is unit-tested"
    ),
    "dedup_ml_minhash": (
        "pyspark.ml MinHashLSH uses library-internal hash seeds DuckDB cannot "
        "reproduce; cross-validated in tests against the oracle-exact "
        "hand-rolled minhash pipeline"
    ),
    "dedup_ml_minhash_stratum": (
        "same pyspark.ml-internal hash seeds as dedup_ml_minhash; the "
        "stratum twin exists so the ml/native cross-validation runs in "
        "full-scale gates (VERDICT r9 #2) — stratum==full-restricted is "
        "pinned in tests/test_dedup.py"
    ),
    "profile_candidate_keys_sketch": (
        "HLL estimates are engine-internal (Spark vs DuckDB registers "
        "differ); the exact twin profile_candidate_keys is oracle-backed "
        "and the sketch is pinned within rsd of it in tests/test_r10_ops.py"
    ),
    "hash_functions_extra": (
        "xxhash64/hash are Spark-proprietary hash functions with no DuckDB "
        "twin (md5/sha variants ARE oracle-checked in the sibling query)"
    ),
    "sim_ann_ivf_kmeans": (
        "pyspark.ml KMeans centroids depend on library-internal init/order; "
        "recall vs exact top-k is unit-tested, and the deterministic-fold "
        "IVF variant `sim_ann_ivf` is oracle-checked"
    ),
    "sim_ann_ml_brp": (
        "pyspark.ml BucketedRandomProjectionLSH draws library-internal "
        "projection vectors; recall invariants are unit-tested, with "
        "`sim_ann_lsh` as the oracle-checked deterministic twin"
    ),
    "embedding_product_quantize_trained": (
        "trained k-means codebooks depend on pyspark.ml's distributed "
        "float-sum merge order (deterministic per seed, not replicable in "
        "DuckDB); the fixed-codebook twin `embedding_product_quantize` is "
        "hash-checked, and tests pin trained-mean-recon-error strictly "
        "below the untrained twin's"
    ),
    "sim_ann_adc_trained_recall": (
        "composes the trained quantizer (above); the recall-vs-exact audit "
        "IS the invariant harness — tests pin trained recall >= the "
        "oracle-checked untrained baseline (`sim_ann_adc_recall`)"
    ),
    "sim_ann_ivfadc_trained": (
        "trained residual codebooks depend on pyspark.ml's distributed "
        "float-sum merge order (deterministic per seed, not replicable in "
        "DuckDB); the fixed-codebook twin `sim_ann_ivfadc` is hash-checked "
        "with identical cells/probes, and tests pin trained residual "
        "recon error strictly below the untrained twin's"
    ),
    "sim_ann_ivfadc_trained_recall": (
        "composes the trained IVFADC index (above); the recall-vs-exact "
        "audit IS the invariant harness — tests pin trained recall >= the "
        "oracle-checked untrained baseline (`sim_ann_ivfadc_recall`)"
    ),
}


def main() -> None:
    specs = all_specs()
    rows_only = {n for n, s in specs.items() if s.oracle is None}
    if rows_only != set(ROWS_ONLY_WHY):
        raise SystemExit(
            f"ROWS_ONLY_WHY out of sync with registry: "
            f"{sorted(rows_only ^ set(ROWS_ONLY_WHY))}"
        )
    by_module = defaultdict(list)
    for spec in specs.values():
        by_module[spec.fn.__module__.split(".")[-1]].append(spec)

    lines = [
        "# OPERATORS — registered query inventory",
        "",
        f"{len(specs)} queries; every row is exposed through "
        "`__spark_entry__.queries()`. *oracle* = hash-checked against DuckDB "
        "at sf0.01 by the driver; *rows-only* ops carry invariant unit tests "
        "instead (tests/).",
        "",
        "The driver hash-checks the first 50 entries of `queries()` per "
        "round. `registry.DRIVER_WINDOW` pins that window explicitly — "
        "oracle-backed queries only (a rows-only entry would burn a slot as "
        "a guaranteed `no_oracle` red; test_window_has_no_oracle_less_queries)"
        " — and rotates across rounds so every oracle-backed query lands a "
        "driver-checked row; queries registered after a round's window froze "
        "are declared in `registry.ROTATION_RESIDUE` and rotate in next round "
        "(test_rotation_completes_oracle_backed_coverage). The local gate "
        "(`python -m vena_etl_tool_spark.testing`) diffs all "
        f"{len(specs)} every run.",
        "",
        "| query | module | check | tags | summary |",
        "|---|---|---|---|---|",
    ]
    for module in sorted(by_module):
        for spec in sorted(by_module[module], key=lambda s: s.name):
            check = "oracle" if spec.oracle else "rows-only"
            summary = (spec.doc.splitlines() or [""])[0].rstrip(".")
            lines.append(
                f"| `{spec.name}` | {module} | {check} | "
                f"{', '.join(spec.tags)} | {summary} |"
            )
    lines += [
        "",
        "## Why each rows-only query has no oracle",
        "",
    ]
    for name in sorted(ROWS_ONLY_WHY):
        lines.append(f"- `{name}` — engine-specific because {ROWS_ONLY_WHY[name]}.")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    print(f"wrote {out}: {len(specs)} queries ({n_oracle} oracle-checked, "
          f"{len(specs) - n_oracle} rows-only)")


if __name__ == "__main__":
    main()
