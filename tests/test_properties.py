"""Property-based tests (hypothesis) for scalar ops, codecs, sketches,
plus generator/pipeline determinism properties."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_ray.analytics.hashing import (
    MinHasher,
    hash_tokens,
    normalize_text,
    simhash64,
)
from ocr_service_ray.ops import textops as T
from ocr_service_ray.stages.ocr import raster
from ocr_service_ray.stages.ocr.sqr import decode_sqr, stamp_sqr


class TestScalarProperties:
    @given(st.integers(0, 999999), st.integers(0, 99))
    def test_to_float_roundtrips_ptbr(self, whole, cents):
        s = f"{whole:,}".replace(",", ".") + f",{cents:02d}"
        assert T.to_float(s) == pytest.approx(whole + cents / 100)

    @given(st.text(max_size=40))
    def test_to_float_never_raises(self, s):
        v = T.to_float(s)
        assert v is None or isinstance(v, float)

    @given(st.text(max_size=60))
    def test_norm_text_idempotent(self, s):
        once = T.norm_text(s)
        assert T.norm_text(once) == once

    @given(st.text(max_size=60))
    def test_clean_desc_charset_invariant(self, s):
        import re

        out = T.clean_desc(s)
        assert out == "ITEM DESCONHECIDO" or not re.search(r"[^A-Z0-9À-Ü\s.,/-]", out)

    @given(st.text(max_size=60))
    def test_parse_money_never_raises(self, s):
        v = T.parse_money_tokens(s)
        assert v is None or isinstance(v, float)

    @given(st.text(max_size=80))
    @settings(max_examples=60)
    def test_normalize_text_matches_duckdb_exactly(self, s):
        """normalize_text is pinned to the ORACLE's semantics (RE2 ASCII
        \\s collapse + Zs-only trim), not Python's unicode defaults —
        the property IS DuckDB parity, on arbitrary unicode input."""
        import duckdb

        from hypothesis import assume

        con = duckdb.connect()
        # scope to inputs where lower() itself agrees: CPython and
        # DuckDB's utf8proc disagree on a handful of codepoints
        # (e.g. U+0130 Turkish İ, unmapped Glagolitic) — that is a
        # lower() implementation gap, not our whitespace/trim logic
        assume(con.execute("SELECT lower(?)", [s]).fetchone()[0] == s.lower())
        out = normalize_text(s)
        want = con.execute(
            "SELECT trim(regexp_replace(lower(?), '\\s+', ' ', 'g'))", [s]
        ).fetchone()[0]
        assert out == want
        assert "  " not in out  # ASCII runs always collapse


class TestCodecProperties:
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
    @settings(max_examples=30)
    def test_raster_roundtrip(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(raster.decode(raster.encode(img)), img)

    @given(st.binary(max_size=64))
    @settings(max_examples=50)
    def test_raster_decode_never_raises(self, payload):
        raster.decode(payload)

    @given(st.text(min_size=1, max_size=60))
    @settings(max_examples=25)
    def test_sqr_roundtrip_any_text(self, payload):
        page = np.zeros((400, 400), dtype=bool)
        stamp_sqr(page, 40, 40, payload)
        assert decode_sqr(page) == payload


class TestSketchProperties:
    @given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=40, unique=True))
    @settings(max_examples=30)
    def test_minhash_identical_sets_match(self, tokens):
        mh = MinHasher(32, seed=1)
        a = mh.signature(hash_tokens(tokens))
        b = mh.signature(hash_tokens(list(tokens)))
        assert (a == b).all()

    @given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=40, unique=True))
    @settings(max_examples=30)
    def test_minhash_order_invariant(self, tokens):
        mh = MinHasher(32, seed=1)
        a = mh.signature(hash_tokens(sorted(tokens)))
        b = mh.signature(hash_tokens(sorted(tokens, reverse=True)))
        assert (a == b).all()

    @given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=30, unique=True))
    @settings(max_examples=30)
    def test_simhash_stable(self, tokens):
        assert simhash64(hash_tokens(tokens)) == simhash64(hash_tokens(tokens))


class TestGeneratorDeterminism:
    def test_regeneration_is_byte_identical(self, tmp_path):
        """Parallel generation must be byte-identical across runs."""
        import hashlib

        from ocr_service_ray.core import storage
        from ocr_service_ray.fixtures.gen import generate_corpus

        digests = []
        for run in range(2):
            root = str(tmp_path / f"run{run}")
            generate_corpus(root, seed=11, n_parts=2, docs_per_part=6, processes=2)
            h = hashlib.sha256()
            for sub in ("docs", "blobs", "expected"):
                for p in storage.list_parts(f"{root}/{sub}"):
                    with open(storage.data_path(f"{root}/{sub}", p), "rb") as f:
                        h.update(f.read())
            digests.append(h.hexdigest())
        assert digests[0] == digests[1]

    def test_serial_equals_parallel(self, tmp_path):
        import hashlib

        from ocr_service_ray.core import storage
        from ocr_service_ray.fixtures.gen import generate_corpus

        digests = []
        for procs in (1, 2):
            root = str(tmp_path / f"p{procs}")
            generate_corpus(root, seed=12, n_parts=2, docs_per_part=5, processes=procs)
            h = hashlib.sha256()
            for sub in ("docs", "blobs", "expected"):
                for p in storage.list_parts(f"{root}/{sub}"):
                    with open(storage.data_path(f"{root}/{sub}", p), "rb") as f:
                        h.update(f.read())
            digests.append(h.hexdigest())
        assert digests[0] == digests[1]


@pytest.mark.usefixtures("ray_session")
class TestPipelineDeterminism:
    def test_wave_size_does_not_change_output(self, tiny_corpus, tmp_path):
        """Same input, different wave partitioning -> identical span content."""
        from dataclasses import replace

        from ocr_service_ray.core import storage
        from ocr_service_ray.core.config import DEFAULT_CONFIG
        from ocr_service_ray.pipeline.run import run_pipeline

        contents = []
        for i, wave in enumerate((0, 1)):
            out = str(tmp_path / f"w{i}")
            run_pipeline(
                tiny_corpus["docs"],
                tiny_corpus["blobs"],
                out,
                cfg=replace(DEFAULT_CONFIG, wave_size=wave),
            )
            snap = {}
            for p in storage.list_parts(out):
                for r in storage.read_part(out, p).to_pylist():
                    snap[r["doc_id"]] = [
                        (s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in r["spans"]
                    ]
            contents.append(snap)
        assert contents[0] == contents[1]
