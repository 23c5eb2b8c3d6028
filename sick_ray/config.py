"""Pipeline configuration — the analogue of the reference's tuning surface.

The reference exposes ``SICKSettings(objectIndexBucketCount=128,
minObjectKeysBeforeIndexing=2)`` (json-sick-scala
``izumi/sick/eba/SICKSettings.scala:3-15``) and per-writer
``SICKWriterParameters`` (``model/SICKWriterParameters.scala:3-13``). Our
engine's equivalent knob set covers shingling, MinHash, LSH banding, skew
salting, clustering and the substring stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """Knobs for the 3-stage dedup pipeline. Defaults are the "reference
    config" the recall target is measured at (SURVEY.md §7.0)."""

    # --- stage toggles (the analogue of sick's dedup/dedupPrimitives
    # flags, SICK.scala:12 / EBABuilder.scala:89-117) ---
    enable_near: bool = True    # False → stage 1 exact dedup only
    # --- shingling / MinHash (stage 2a) ---
    shingle_k: int = 5          # word shingle width
    num_perm: int = 128         # MinHash permutations
    seed: int = 0               # hash seed for everything downstream
    # --- LSH banding (stage 2b) ---
    bands: int = 16             # bands × rows_per_band must equal num_perm
    rows_per_band: int = 8
    # skew: buckets larger than this get salted into sub-buckets
    # (north_rule: explicit salted-key repartitioning for boilerplate skew)
    hot_bucket_threshold: int = 64
    salt_fanout: int = 16       # sub-buckets per hot bucket
    # buckets whose all-pairs count exceeds this fall back to star + chain
    # edges; the shortfall is surfaced as truncated_pairs/truncated_buckets
    # counters in the edges-stage manifest (never silent)
    max_pairs_per_bucket: int = 4096
    # drop singleton band buckets map-side against a Bloom of ≥2-member
    # buckets built from the count pre-pass (only those can emit a pair;
    # Bloom false positives emit nothing → output bit-identical, tested).
    # Measured at sf0.1-equivalent (200k docs): 69% of band rows dropped
    # before the pair sort; single-box wall NEUTRAL (local shuffles are
    # memcpy-bound and the count pre-pass still moves all rows), but
    # total exchanged rows fall ~34% (prepass 16n + pairs 16n → prepass
    # 16n + pairs ~5n) — the win is cross-NODE network exchange on a
    # real cluster (stages/lsh.py::dup_bucket_index)
    dup_bucket_prefilter: bool = True
    # --- candidate verification (stage 2b→2c) ---
    verify: str = "signature"   # "signature" | "none"
    verify_threshold: float = 0.72  # est. Jaccard (matching sig fraction)
    # --- clustering (stage 2c: alternating large-star/small-star rounds
    # over the edges Dataset; Kiveris et al.) ---
    driver_uf_max_edges: int = 2_000_000  # below this, fold edges on driver
    # middle tier: up to this many edges, one vectorized cluster-side
    # task labels the whole graph (components.single_task_components);
    # above it the alternating-star shuffle rounds take over
    single_task_cc_max_edges: int = 64_000_000
    # --- substring dedup (stage 3) ---
    min_span: int = 256         # bytes; minimal duplicated span to report
    span_stride: int = 24       # content-anchor density (1/stride per byte); miss prob
                                # for a min_span dup ≈ (1-1/stride)^(min_span/2) ≈ 0.4%
    suffix_partitions: int = 0  # 0 = let Ray pick block partitioning
    # --- execution ---
    batch_size: int = 1024      # docs per batch for minhash actors
    minhash_concurrency: int = 8  # actor pool size for the MinHash stage
    # run the near and spans branches sequentially instead of overlapped:
    # peak spill-disk = max(branch) rather than sum — for clusters whose
    # local spill volume is bounded (wall becomes the branch sum)
    serial_branches: bool = False
    num_partitions: int = 32    # hash-join / shuffle partition count

    def __post_init__(self):
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands({self.bands}) * rows_per_band({self.rows_per_band}) "
                f"must equal num_perm({self.num_perm})"
            )


DEFAULT_CONFIG = DedupConfig()


@dataclass(frozen=True)
class AnnConfig:
    """Approximate-nearest-neighbor stage knobs."""

    k: int = 10
    metric: str = "cosine"
    # LSH variant: random-hyperplane signatures
    n_planes: int = 16
    n_tables: int = 8
    seed: int = 0
