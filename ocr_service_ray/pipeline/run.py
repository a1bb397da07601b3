"""The extraction pipeline driver: resumable Ray Data job.

Lifecycle (SURVEY.md §3.4):

    ledger: committed = partitions with a manifest → skip (RESUME)
    ds = read_{lance|parquet}(remaining parts, include_paths)   [source]
    ds = ds.map_batches(explode_and_extract)                    [stateless]
    ds = ds.repartition(K)                                      [skew spread]
    ds = ds.map_batches(OcrStage, concurrency=(m,n), ...)       [actor pool]
    ds.groupby("part_id").map_groups(reassemble + atomic write) [shuffle+sink]

The reference has no batch runner at all (one HTTP request per document,
/root/reference/app/main.py:108-143); everything here is new design.
This module never calls ``ray.init`` — callers (bench.py, tests, the
round driver) own the Ray session.
"""

from __future__ import annotations

import json
import os
import tempfile

from ..core import storage
from ..core.config import DEFAULT_CONFIG, PipelineConfig
from ..stages.batch_stages import OcrStage, explode_and_extract, make_partition_writer


def run_pipeline(
    docs_root: str,
    blobs_root: str,
    out_root: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
) -> dict:
    """Run (or resume) the extraction job; returns run metrics."""
    all_parts = storage.list_parts(docs_root)
    if resume:
        done = set(storage.committed_parts(out_root))
        redone = storage.clear_uncommitted(out_root)
    else:
        done = set()
        redone = []
        # fresh run: stale committed partitions from a prior run (possibly
        # over different input) must not survive into this run's output
        storage.clear_all_parts(out_root)
    remaining = [p for p in all_parts if p not in done]
    summary = {
        "n_parts": len(all_parts),
        "skipped_committed": len(done),
        "cleared_uncommitted": len(redone),
        "processed": len(remaining),
        "parts": [],
    }
    if not remaining:
        _write_metrics(out_root, summary)
        return summary

    # WAVES: the reassembly groupby is a barrier, so a single-wave run
    # commits nothing until the whole job finishes — at 100 TB that
    # makes "resume" worthless. Processing wave_size partitions per
    # barrier bounds the work a crash can lose to one wave.
    wave = cfg.wave_size if cfg.wave_size > 0 else len(remaining)
    for i in range(0, len(remaining), wave):
        summary["parts"].extend(
            _run_wave(docs_root, blobs_root, out_root, remaining[i : i + wave], cfg)
        )
    summary["parts"] = sorted(summary["parts"], key=lambda m: m["part_id"])
    for m in summary["parts"]:
        m.update({k: int(v) for k, v in m.items()})
    _write_metrics(out_root, summary)
    return summary


def _run_wave(
    docs_root: str,
    blobs_root: str,
    out_root: str,
    parts: list[int],
    cfg: PipelineConfig,
) -> list[dict]:
    """One committed wave of partitions; returns their metrics rows."""
    if cfg.target_max_block_size:
        import ray.data

        ray.data.DataContext.get_current().target_max_block_size = (
            cfg.target_max_block_size
        )
    files = storage.data_files(docs_root, parts)
    # locality-preserving skew spread: many small read blocks per input
    # partition (spans of one partition stay contiguous -> the OCR
    # actor's blob-part cache hits; a media-heavy partition still fans
    # out over blocks_per_part blocks)
    ds = storage.ray_read(
        files,
        include_paths=True,
        override_num_blocks=max(1, len(parts) * cfg.blocks_per_part),
    )
    ds = ds.map_batches(explode_and_extract, batch_format="pyarrow")
    if cfg.cost_repartition:
        # explicit all-to-all spread for pathological skew (off by
        # default: it executes as a barrier and scrambles blob locality)
        ds = ds.repartition(max(len(parts), cfg.num_cost_buckets))
    import ray

    # FIXED actor pool sized to the cluster: the autoscaling (min, max)
    # pool ramps up too slowly for batch jobs — measured utilization was
    # ~40% because actors started one by one while tasks queued. Reserve
    # a few CPUs for read/sort/write tasks.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    # reserve ~1/8 of CPUs (min 1) for read/sort/write tasks; a constant
    # reserve skews small-cluster runs (2 of 4 cpus idle made the 4->16
    # scaling measurement dishonestly superlinear)
    # never reserve ALL cpus for actors: on a 1-2 CPU cluster an actor
    # pool of 2 (each 1.0 CPU) would starve read/groupby tasks
    frac = os.environ.get("GRAFT_POOL_FRACTION")
    if frac:
        # scaling-measurement mode: pin the actor fraction so two
        # cluster sizes are compared at EQUAL proportions — the integer
        # reserve (3/4 vs 14/16 actors) otherwise makes the bigger
        # cluster look superlinear (per-ACTOR throughput is flat)
        pool = max(1, min(cfg.extract_concurrency[1], int(n_cpus * float(frac))))
    else:
        pool = max(1, min(cfg.extract_concurrency[1], n_cpus - max(1, n_cpus // 8)))
    actor_kwargs = {
        "blobs_root": blobs_root,
        "cache_parts": cfg.blob_cache_parts,
        "conf_floor": cfg.conf_floor,
    }
    if cfg.blob_fetcher is not None:
        actor_kwargs["fetcher"] = cfg.blob_fetcher
    if cfg.blob_lookup_mode == "broadcast":
        # small-corpus path: ship the whole blob dict through the object
        # store ONCE (SURVEY.md §2.4 fallback); partition mode is the
        # scale path
        blobs: dict[str, bytes] = {}
        for p in storage.list_parts(blobs_root):
            t = storage.read_part(blobs_root, p, columns=["media_ref", "bytes"])
            blobs.update(zip(t.column("media_ref").to_pylist(), t.column("bytes").to_pylist()))
        actor_kwargs["blob_ref"] = ray.put(blobs)
    ds = ds.map_batches(
        OcrStage,
        fn_constructor_kwargs=actor_kwargs,
        batch_size=cfg.extract_batch_size,
        concurrency=pool,
        num_cpus=cfg.extract_num_cpus,
        batch_format="pyarrow",
    )
    sink = ds.groupby("part_id").map_groups(
        make_partition_writer(out_root, docs_root), batch_format="pyarrow"
    )
    rows = sink.take_all()
    if os.environ.get("GRAFT_STATS"):
        print(sink.stats())
    return rows


def _write_metrics(out_root: str, summary: dict) -> None:
    os.makedirs(out_root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".metrics.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(summary, f, indent=1, default=int)
    os.replace(tmp, os.path.join(out_root, "metrics.json"))


# ----------------------------------------------------------------------
def verify_output(out_root: str, expected_root: str) -> dict:
    """Span-sequence equality (kind, text, media_ref, order) per doc_id.

    The BASELINE.json per-row invariant. Compares partition by partition
    (pure pyarrow, driver-side — outputs are small relative to inputs).
    """
    total = 0
    bad = 0
    examples = []
    for part in storage.list_parts(expected_root):
        exp = {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"]) for s in r["spans"]
            ]
            for r in storage.read_part(expected_root, part).to_pylist()
        }
        got = {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"]) for s in r["spans"]
            ]
            for r in storage.read_part(out_root, part).to_pylist()
        }
        for doc_id, want in exp.items():
            total += 1
            if got.get(doc_id) != want:
                bad += 1
                if len(examples) < 5:
                    examples.append(
                        {"doc_id": doc_id, "want": want, "got": got.get(doc_id)}
                    )
    return {
        "docs": total,
        "mismatched": bad,
        "match_rate": 1.0 if total == 0 else (total - bad) / total,
        "examples": examples,
    }


# ----------------------------------------------------------------------
def main(argv: list[str] | None = None) -> int:
    import argparse

    import ray

    ap = argparse.ArgumentParser(description="Run the extraction pipeline")
    ap.add_argument("--corpus", default="/tmp/ocr_corpus", help="corpus root (docs/blobs/expected)")
    ap.add_argument("--out", default="/tmp/ocr_out")
    ap.add_argument("--scale", default=None,
                    choices=["tiny", "small", "medium", "bench", "huge"],
                    help="generate the corpus at this scale first if missing")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--profile", default="default")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=0, help="0 = ray default")
    args = ap.parse_args(argv)

    docs = os.path.join(args.corpus, "docs")
    if args.scale and not storage.list_parts(docs):
        from ..fixtures.gen import generate_scale

        info = generate_scale(args.corpus, args.scale, seed=args.seed, profile=args.profile)
        print("generated:", json.dumps(info))

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    try:
        summary = run_pipeline(
            docs,
            os.path.join(args.corpus, "blobs"),
            args.out,
            resume=not args.no_resume,
        )
        print("run:", json.dumps({k: v for k, v in summary.items() if k != "parts"}))
        check = verify_output(args.out, os.path.join(args.corpus, "expected"))
        print("verify:", json.dumps({k: v for k, v in check.items() if k != "examples"}))
        if check["mismatched"]:
            print("first mismatches:", json.dumps(check["examples"])[:2000])
            return 1
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
