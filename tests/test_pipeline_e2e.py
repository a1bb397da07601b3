"""End-to-end Ray pipeline tests: span equality, resume, skew, errors.

The north-rule invariant (BASELINE.json): span-sequence equality
(kind, text, media_ref, order) per doc_id against the generator oracle.
"""

from __future__ import annotations

import os

import pytest

from ocr_service_ray.core import storage
from ocr_service_ray.fixtures.gen import generate_corpus
from ocr_service_ray.pipeline.run import run_pipeline, verify_output


@pytest.mark.usefixtures("ray_session")
class TestPipelineE2E:
    def test_span_equality_tiny(self, tiny_corpus, tmp_path):
        out = str(tmp_path / "out")
        summary = run_pipeline(tiny_corpus["docs"], tiny_corpus["blobs"], out)
        assert summary["processed"] == tiny_corpus["n_parts"]
        check = verify_output(out, tiny_corpus["expected"])
        assert check["docs"] == tiny_corpus["n_docs"]
        assert check["mismatched"] == 0, check["examples"]

    def test_resume_skips_committed_and_redoes_uncommitted(self, tiny_corpus, tmp_path):
        out = str(tmp_path / "out")
        run_pipeline(tiny_corpus["docs"], tiny_corpus["blobs"], out)
        mtimes = {
            p: os.path.getmtime(storage.data_path(out, p))
            for p in storage.list_parts(out)
        }
        # simulate a crash that lost part 1's manifest mid-write
        os.unlink(storage.manifest_path(out, 1))
        summary = run_pipeline(tiny_corpus["docs"], tiny_corpus["blobs"], out)
        assert summary["skipped_committed"] == 1
        assert summary["cleared_uncommitted"] == 1
        assert summary["processed"] == 1
        assert os.path.getmtime(storage.data_path(out, 0)) == mtimes[0]
        assert os.path.getmtime(storage.data_path(out, 1)) != mtimes[1]
        check = verify_output(out, tiny_corpus["expected"])
        assert check["mismatched"] == 0

    def test_error_records_present_not_failures(self, tiny_corpus, tmp_path):
        """Corrupt/dangling blobs must yield erro spans and count in manifests."""
        out = str(tmp_path / "out")
        run_pipeline(tiny_corpus["docs"], tiny_corpus["blobs"], out)
        # the oracle knows which spans are erro; cross-check manifests add up
        n_erro = 0
        for p in storage.list_parts(tiny_corpus["expected"]):
            for r in storage.read_part(tiny_corpus["expected"], p).to_pylist():
                n_erro += sum(1 for s in r["spans"] if s["kind"] == "erro")
        manifest_errors = sum(
            storage.read_manifest(out, p)["n_errors"] for p in storage.list_parts(out)
        )
        assert manifest_errors == n_erro

    def test_skewed_profile_equality(self, tmp_path):
        """99% text-only docs + 1% 50-media docs: output equality holds."""
        root = str(tmp_path / "skew")
        info = generate_corpus(root, seed=7, n_parts=2, docs_per_part=100, profile="skewed")
        out = str(tmp_path / "skew_out")
        run_pipeline(info["docs"], info["blobs"], out)
        check = verify_output(out, info["expected"])
        assert check["docs"] == 200
        assert check["mismatched"] == 0, check["examples"][:1]

    def test_blob_fetcher_hook_serves_all_blobs(self, tiny_corpus, tmp_path):
        """The multi-node blob-store hook: with blobs_root pointing at a
        path that does NOT exist, a custom fetcher must serve every
        lookup — span equality proves no blob fell back to local files."""
        from ocr_service_ray.core.config import PipelineConfig

        real_blobs = tiny_corpus["blobs"]

        def fetch(_root: str, part: int):
            return storage.read_part(real_blobs, part, columns=["media_ref", "bytes"])

        out = str(tmp_path / "out")
        run_pipeline(
            tiny_corpus["docs"], str(tmp_path / "no-such-blobs"), out,
            cfg=PipelineConfig(blob_fetcher=fetch),
        )
        check = verify_output(out, tiny_corpus["expected"])
        assert check["mismatched"] == 0, check["examples"][:1]

    def test_broken_engine_constant_trips_span_gate(self):
        """The span-query family is self-verifying: a deliberately-broken
        engine constant (conf_floor above every token's confidence, plumbed
        through PipelineConfig to the OCR actors) must make run_span_pipeline
        RAISE on the generator oracle, not return plausible rows."""
        from ocr_service_ray.core.config import PipelineConfig
        from ocr_service_ray.pipeline import entry_api

        broken = PipelineConfig(conf_floor=1.01)
        with pytest.raises(entry_api.SpanVerificationError):
            entry_api.run_span_pipeline("tiny", seed=42, cfg=broken)
        # the good (default-config) path still passes and caches
        info, out = entry_api.run_span_pipeline("tiny", seed=42)
        assert verify_output(out, info["expected"])["mismatched"] == 0

    def test_output_schema_matches_input_hint(self, tiny_corpus, tmp_path):
        import pyarrow as pa

        from ocr_service_ray.core.schema import DOC_OUT_SCHEMA

        out = str(tmp_path / "out")
        run_pipeline(tiny_corpus["docs"], tiny_corpus["blobs"], out)
        tbl = storage.read_part(out, 0)
        assert tbl.schema.equals(DOC_OUT_SCHEMA) or tbl.cast(DOC_OUT_SCHEMA).schema.equals(
            DOC_OUT_SCHEMA
        )
        # doc-level status invariants (reference structure_data semantics)
        tipos = set(tbl.column("tipo_documento").to_pylist())
        assert tipos <= {"venda", "gasto", "erro"}
        confs = tbl.column("confianca").to_pylist()
        assert all(0.0 <= c <= 1.0 for c in confs)
        for row in tbl.to_pylist():
            has_text = any(s["kind"] == "text" for s in row["spans"])
            if not has_text:
                assert row["tipo_documento"] == "erro"
                assert row["mensagem"] == "Nenhuma linha OCR encontrada"
                assert row["confianca"] == 0.0
            else:
                n_err = sum(1 for s in row["spans"] if s["kind"] == "erro")
                if n_err:
                    assert row["mensagem"] == f"{n_err} spans com erro"
                else:
                    assert row["mensagem"] is None


class TestVectorizedNorm:
    def test_arrow_norm_matches_scalar(self):
        import pyarrow as pa

        from ocr_service_ray.ops.textops import norm_text
        from ocr_service_ray.stages.batch_stages import _norm_text_arrow

        cases = ["", "  a  b ", "x×y", "ZER0 I0G", "a\t\nb\v c",
                 "OUOS UOS", "1Ux SUIFT", None, "a\f b\r", "2×3  4"]
        got = _norm_text_arrow(pa.array(cases, pa.string())).to_pylist()
        assert got == [norm_text(c) for c in cases]

    def test_arrow_norm_unicode_whitespace_fuzz(self):
        import random

        import pyarrow as pa

        from ocr_service_ray.ops.textops import norm_text
        from ocr_service_ray.stages.batch_stages import _norm_text_arrow

        ws = " \t\n\r\f\v\x1c\x1d\x1e\x1f\x85\xa0      　"
        alpha = "abXZ09×ZER0UOSUH.," + ws
        rng = random.Random(99)
        cases = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
                 for _ in range(2000)]
        got = _norm_text_arrow(pa.array(cases, pa.string())).to_pylist()
        assert got == [norm_text(c) for c in cases]


@pytest.mark.usefixtures("ray_session")
class TestJobSubmitEntry:
    """jobs/run_extract.py — the ray-job-submit driver: same pipeline,
    cluster-attach handled by env, corpus generation refused."""

    def _main(self):
        import importlib.util
        import pathlib

        path = pathlib.Path(__file__).parent.parent / "jobs" / "run_extract.py"
        spec = importlib.util.spec_from_file_location("jobs_run_extract", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.main

    def test_job_entry_runs_and_verifies(self, tiny_corpus, tmp_path):
        out = str(tmp_path / "job_out")
        root = os.path.dirname(tiny_corpus["docs"])
        rc = self._main()(
            ["--corpus", root, "--out", out, "--no-resume", "--verify"]
        )
        assert rc == 0
        assert storage.committed_parts(out)

    def test_job_entry_refuses_missing_corpus(self, tmp_path):
        rc = self._main()(
            ["--corpus", str(tmp_path / "nope"), "--out", str(tmp_path / "o")]
        )
        assert rc == 2
