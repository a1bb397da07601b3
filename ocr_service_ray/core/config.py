"""Pipeline configuration.

The reference hardcodes its knobs as class attributes and magic numbers
(confidence floor 0.35 at /root/reference/app/ocr_engine.py:126, column
cuts at :196-198, uvicorn workers=2 at app/main.py:170). We surface the
same knobs — plus Ray-specific sizing — in one frozen dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- extraction semantics ---
    conf_floor: float = 0.35  # drop OCR tokens below (reference ocr_engine.py:126)
    y_tol: int = 6  # y-clustering tolerance px (reference ocr_engine.py:200)
    next_group_max_dy: int = 18  # total-lookahead window (reference ocr_engine.py:202)
    # column cuts: "fixed" uses the pixel bands below; "auto" derives cuts
    # from x-histogram valleys (XY-cut style) and falls back to fixed.
    column_mode: str = "auto"
    x_left_max: int = 620
    x_mid_min: int = 620
    x_right_min: int = 900

    # --- Ray sizing ---
    extract_batch_size: int = 64  # spans per batch into the extract actor pool
    extract_concurrency: tuple = (2, 16)  # actor pool (min, max); >16 actors on this box enters host-oversubscribed vCPU territory (see BENCH/BASELINE.md microbenchmark) and adds variance, not throughput
    extract_num_cpus: float = 1.0
    reassembly_num_partitions: int = 0  # 0 = let Ray pick
    # Skew control happens at the READ: the source is split into
    # blocks_per_part locality-preserving blocks per input partition, so
    # a many-media partition spreads over many blocks WITHOUT an
    # all-to-all repartition (which Ray executes as a barrier). An
    # explicit shuffle repartition remains available for pathological
    # skew (cost_repartition=True).
    blocks_per_part: int = 8
    cost_repartition: bool = False
    num_cost_buckets: int = 64
    # Ray DataContext.target_max_block_size override (bytes; 0 = Ray
    # default 128 MiB). Matters for fat-media corpora: a block must fit
    # worker heap TIMES actor concurrency — with multi-MB blobs resolved
    # inside the actor the default is fine (shuffled rows carry only
    # refs), but a pipeline that DID carry decoded payloads between
    # stages should drop this to ~16-32 MiB.
    target_max_block_size: int = 0

    # --- blob lookup ---
    blob_lookup_mode: str = "partition"  # "partition" (co-partitioned files) | "broadcast"
    blob_cache_parts: int = 2  # per-actor LRU of blob partition dicts (locality-preserving read blocks keep hit rates high; large caches x many actors = tens of GB of heap)
    # multi-node blob-store hook: None = blobs_root is a path every node
    # resolves (shared fs / pyarrow-openable object store); else a
    # picklable (blobs_root, part_id) -> pa.Table(media_ref, bytes)
    # callable for stores pyarrow cannot open (see OcrStage docstring)
    blob_fetcher: object = None

    # --- resume ---
    # input partitions per committed wave; 0 = all remaining (single
    # barrier). Measured at medium/16cpu: wave 8 costs 15%, wave 4 costs
    # 2x — barriers dominate when a wave is seconds of work. At 100 TB a
    # wave is hours of work and the barrier amortizes to noise: size
    # waves there so one wave ~= 10-30 min (bounds crash loss; resume
    # skips committed waves — drill in tools/kill_resume_drill.py).
    wave_size: int = 0


DEFAULT_CONFIG = PipelineConfig()
