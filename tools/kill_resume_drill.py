"""Crash-resume drill: SIGKILL a wave-mode pipeline run mid-job, verify
committed partitions survive untouched and a resume completes exactly.

Usage: python tools/kill_resume_drill.py [corpus_root]
(Defaults to the cached small corpus; see BENCH/BASELINE.md for the
recorded result.)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time


def main() -> int:
    if len(sys.argv) > 1:
        corpus = sys.argv[1]
    else:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from ocr_service_ray.pipeline.entry_api import span_corpus

        corpus = os.path.dirname(span_corpus("small")["docs"])
    out = tempfile.mkdtemp(prefix="killdrill_")
    script = f"""
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)
from dataclasses import replace
from ocr_service_ray.core.config import DEFAULT_CONFIG
from ocr_service_ray.pipeline.run import run_pipeline
cfg = replace(DEFAULT_CONFIG, wave_size=2)
run_pipeline("{corpus}/docs", "{corpus}/blobs", "{out}", cfg=cfg)
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.Popen(
        [sys.executable, "-c", script], cwd=repo,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    sys.path.insert(0, repo)
    from ocr_service_ray.core import storage

    t0 = time.time()
    while time.time() - t0 < 300:
        if len(storage.committed_parts(out)) >= 2:
            break
        time.sleep(0.5)
    p.kill()
    p.wait()
    committed = storage.committed_parts(out)
    n_total = len(storage.list_parts(f"{corpus}/docs"))
    print(f"committed at kill: {committed} (of {n_total})")
    assert 0 < len(committed) < n_total, "kill did not land mid-run"

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)
    from dataclasses import replace

    from ocr_service_ray.core.config import DEFAULT_CONFIG
    from ocr_service_ray.pipeline.run import run_pipeline, verify_output

    mtimes = {pt: os.path.getmtime(storage.data_path(out, pt)) for pt in committed}
    s = run_pipeline(f"{corpus}/docs", f"{corpus}/blobs", out,
                     cfg=replace(DEFAULT_CONFIG, wave_size=2))
    for pt in committed:
        assert os.path.getmtime(storage.data_path(out, pt)) == mtimes[pt], f"part {pt} rewritten"
    check = verify_output(out, f"{corpus}/expected")
    print(f"resume: skipped={s['skipped_committed']} redone={s['processed']}; "
          f"final mismatches {check['mismatched']}/{check['docs']}")
    ray.shutdown()
    return 1 if check["mismatched"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
