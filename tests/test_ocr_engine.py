"""OCR stack tests: raster codec, preprocessing, recognition, layout parse."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_service_ray.fixtures.render import line_ground_truth, render_page
from ocr_service_ray.stages.ocr import preprocess as P
from ocr_service_ray.stages.ocr import raster
from ocr_service_ray.stages.ocr.engine import OcrEngine
from ocr_service_ray.stages.ocr.layout import (
    group_by_y,
    item_band,
    parse_items,
    structure_document,
)


@pytest.fixture(scope="module")
def engine():
    return OcrEngine()


class TestRaster:
    def test_roundtrip(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        assert np.array_equal(raster.decode(raster.encode(img)), img)

    @pytest.mark.parametrize(
        "payload",
        [None, b"", b"JUNK", b"SYNR 5 5\nxx", b"SYNR -1 2\n", b"SYNR a b\n", b"SYNR 1 1"],
    )
    def test_garbage_returns_none(self, payload):
        assert raster.decode(payload) is None


class TestPreprocess:
    def test_otsu_separates_bimodal(self):
        img = np.full((20, 20), 230, dtype=np.uint8)
        img[5:10, 5:10] = 20
        t = P.otsu_threshold(img)
        assert 20 <= t < 230  # ink is pixels <= t, so t == 20 is valid
        assert P.binarize(img)[7, 7] and not P.binarize(img)[0, 0]

    def test_despeckle_kills_isolated(self):
        ink = np.zeros((10, 10), dtype=bool)
        ink[5, 5] = True  # lone pixel
        ink[1:3, 1:3] = True  # 2x2 cluster
        out = P.despeckle(ink, min_neighbors=2)
        assert not out[5, 5]
        assert out[1:3, 1:3].all()

    @pytest.mark.parametrize("angle", [-3.0, -1.5, 1.5, 3.0])
    def test_deskew_recovers_angle(self, angle):
        rng = np.random.default_rng(0)
        page = render_page([[(0, "UMA LINHA DE TEXTO PARA MEDIR")]] * 4, rng, rotate_deg=angle)
        ink = P.binarize(raster.decode(page))
        _, est = P.deskew(ink)
        assert abs(est - angle) < 0.5  # estimate ~= page skew


class TestRecognition:
    def test_clean_page_exact(self, engine):
        rng = np.random.default_rng(1)
        lines = [[(0, "ABCDEFGHIJKLM")], [(0, "NOPQRSTUVWXYZ")], [(0, "0123456789 .,-:/")]]
        pay = render_page(lines, rng)
        assert engine.recognize_lines(pay) == "\n".join(line_ground_truth(l) for l in lines)

    def test_rotated_noisy_page_exact(self, engine):
        rng = np.random.default_rng(2)
        lines = [[(0, "TEXTO COM RUIDO E ROTACAO 123")], [(0, "SEGUNDA LINHA 456")]]
        pay = render_page(lines, rng, rotate_deg=2.5, noise_rate=0.005)
        assert engine.recognize_lines(pay) == "\n".join(line_ground_truth(l) for l in lines)

    def test_corrupt_payload_empty(self, engine):
        assert engine.extract_text(b"not a raster") == []
        assert engine.recognize_lines(None) is None

    def test_blank_page_none(self, engine):
        img = np.full((60, 60), 240, dtype=np.uint8)
        assert engine.recognize_lines(raster.encode(img)) is None

    def test_tokens_sorted_with_positions(self, engine):
        rng = np.random.default_rng(3)
        pay = render_page([[(0, "AA"), (200, "BB")], [(0, "CC")]], rng)
        toks = engine.extract_text(pay)
        assert [t["text"] for t in toks] == ["AA", "BB", "CC"]
        assert toks[0]["y_position"] == toks[1]["y_position"] < toks[2]["y_position"]
        assert toks[0]["x_position"] < toks[1]["x_position"]
        assert all(t["confidence"] >= 0.35 for t in toks)


class TestSatellitePrune:
    """A salt cluster whose pixels all keep >= 2 8-neighbors survives
    despeckle(min_neighbors=2); when it lands within the 3 px column-merge
    tolerance of a glyph it inflates the crop box and misaligns the
    centered embedding beyond the +-1 px shift search. Found at huge
    scale (2/262,144 docs): a comma with an attached 3-px cluster
    XOR-matched "." (21) over "," (39). The matcher now retries
    low-score glyphs with sub-stroke satellites pruned."""

    def _comma_patch_with_satellite(self):
        from ocr_service_ray.stages.ocr import glyphs as G

        comma = G.glyph_bank(G.RENDER_SCALE)[","]  # 21x15, ink rows 12-20
        crop_r = np.flatnonzero(comma.any(axis=1))
        crop_c = np.flatnonzero(comma.any(axis=0))
        body = comma[crop_r[0] : crop_r[-1] + 1, crop_c[0] : crop_c[-1] + 1]
        h, w = body.shape  # 9x9 at scale 3
        # embed with a 3-px L-shaped salt cluster 3 blank cols to the
        # right of the comma head (the despeckle-stable shape observed)
        patch = np.zeros((h + 1, w + 5), dtype=body.dtype)
        patch[1:, :w] = body
        patch[0, w + 3] = patch[0, w + 4] = patch[1, w + 4] = 1
        return patch

    def test_contaminated_comma_reads_comma(self, engine):
        patch = self._comma_patch_with_satellite()
        text, scores = engine.bank.match_patches([patch])
        assert text == ","
        assert scores[0] > 0.9

    def test_prune_drops_only_substroke_satellites(self):
        from ocr_service_ray.stages.ocr.recognize import _prune_satellites

        patch = self._comma_patch_with_satellite()
        pruned = _prune_satellites(patch, 3)
        assert pruned is not None
        assert int(pruned.sum()) == int(patch.sum()) - 3  # satellite gone
        # single-component patch: nothing prunable
        assert _prune_satellites(pruned, 3) is None
        # ":" is two legitimate stroke-sized components — must NOT prune
        from ocr_service_ray.stages.ocr import glyphs as G

        colon = G.glyph_bank(G.RENDER_SCALE)[":"]
        assert _prune_satellites(colon, 3) is None

    def test_prune_never_drops_interior_fragments(self):
        """A sub-stroke fragment INSIDE the main component's bbox is real
        glyph ink shed by rotation resampling, not a crop-inflating
        satellite — pruning it de-fragments the glyph toward a simpler
        class (an "R" missing a leg fragment reads "P"; seen at bench
        scale before the bbox guard)."""
        from ocr_service_ray.stages.ocr import glyphs as G
        from ocr_service_ray.stages.ocr.recognize import _prune_satellites

        r = G.glyph_bank(G.RENDER_SCALE)["R"].copy()
        # carve a 2-px moat around one interior ink pixel cluster to make
        # it a separate small component inside the body's bbox
        ys, xs = (r > 0).nonzero()
        cy, cx = int(ys.mean()), int(xs.mean())
        r[cy - 2 : cy + 3, cx - 2 : cx + 3] = 0
        r[cy, cx] = 1  # 1-px interior island, well under scale*scale
        assert _prune_satellites(r, 3) is None

    def test_components8_diagonal_connectivity(self):
        from ocr_service_ray.stages.ocr.recognize import _components8

        m = np.zeros((4, 4), dtype=bool)
        m[0, 0] = m[1, 1] = True  # diagonal touch -> one component
        m[3, 3] = True  # isolated -> second component
        comps = _components8(m)
        assert sorted(int(c.sum()) for c in comps) == [1, 2]


class TestYGrouping:
    # greedy running-centroid semantics of /root/reference/app/ocr_engine.py:334-354
    def _tok(self, y, x, text="t"):
        return {"y_position": y, "x_position": x, "text": text}

    def test_within_tolerance_joins_first_group(self):
        groups = group_by_y([self._tok(10, 0), self._tok(14, 5), self._tok(30, 0)], y_tol=6)
        assert len(groups) == 2
        assert len(groups[0]["tokens"]) == 2

    def test_centroid_drift(self):
        # y_ref drifts: 10 -> (10+14)//2=12 -> token at 18 joins (|18-12|<=6)
        groups = group_by_y([self._tok(10, 0), self._tok(14, 0), self._tok(18, 0)], y_tol=6)
        assert len(groups) == 1
        # without drift (ref stays 10) the 18 token would not join
        groups2 = group_by_y([self._tok(10, 0), self._tok(18, 0)], y_tol=6)
        assert len(groups2) == 2

    def test_groups_sorted_tokens_x_sorted(self):
        groups = group_by_y([self._tok(50, 9), self._tok(50, 1), self._tok(5, 0)], y_tol=6)
        assert groups[0]["y_ref"] == 5
        assert [t["x_position"] for t in groups[1]["tokens"]] == [1, 9]

    def test_null_x_sorts_last(self):
        groups = group_by_y(
            [
                {"y_position": 5, "x_position": None, "text": "b"},
                {"y_position": 5, "x_position": 3, "text": "a"},
            ],
            y_tol=6,
        )
        assert [t["text"] for t in groups[0]["tokens"]] == ["a", "b"]


class TestItemParsing:
    def _receipt_tokens(self):
        # columns: left 0-300, mid 400-520, right 620+ (>=42px gaps)
        return [
            {"y_position": 0, "x_position": 0, "x_end": 100, "text": "SQ.CODIGO DESC"},
            {"y_position": 20, "x_position": 0, "x_end": 300, "text": "01 12345678 ARROZ"},
            {"y_position": 20, "x_position": 400, "x_end": 520, "text": "2UN X 5,99"},
            {"y_position": 20, "x_position": 620, "x_end": 690, "text": "11,98"},
            {"y_position": 40, "x_position": 0, "x_end": 300, "text": "02 87654321 FEIJAO"},
            {"y_position": 40, "x_position": 400, "x_end": 520, "text": "1UN X 8,50"},
            {"y_position": 40, "x_position": 620, "x_end": 690, "text": "8,50"},
            {"y_position": 60, "x_position": 0, "x_end": 150, "text": "VALOR TOTAL"},
            {"y_position": 60, "x_position": 620, "x_end": 690, "text": "20,48"},
        ]

    def test_band_excludes_marker_and_stop(self):
        band = item_band(self._receipt_tokens())
        texts = {t["text"] for t in band}
        assert "SQ.CODIGO DESC" not in texts
        assert "VALOR TOTAL" not in texts
        assert "01 12345678 ARROZ" in texts

    def test_items_parsed(self):
        items = parse_items(self._receipt_tokens(), "gasto", "EMISSAO: 12/03/2024")
        assert [i["item"] for i in items] == ["ARROZ", "FEIJAO"]
        assert items[0]["quantidade"] == 2.0
        assert items[0]["valor_unitario"] == 5.99
        assert items[0]["valor_total"] == 11.98
        assert items[0]["data_compra"] == "12/03/2024"
        assert items[0]["data_venda"] is None

    def test_total_imputed_from_unit_when_qty_one(self):
        toks = [
            {"y_position": 0, "x_position": 0, "x_end": 100, "text": "SQ.CODIGO DESC"},
            {"y_position": 20, "x_position": 0, "x_end": 300, "text": "01 12345678 CAFE"},
            {"y_position": 20, "x_position": 400, "x_end": 520, "text": "1UN X 7,77"},
        ]
        items = parse_items(toks, "gasto", "")
        assert items[0]["valor_total"] == 7.77

    def test_unit_imputed_from_total(self):
        toks = [
            {"y_position": 0, "x_position": 0, "x_end": 100, "text": "SQ.CODIGO DESC"},
            {"y_position": 20, "x_position": 0, "x_end": 300, "text": "01 12345678 CAFE"},
            {"y_position": 20, "x_position": 620, "x_end": 690, "text": "9,00"},
        ]
        items = parse_items(toks, "gasto", "")
        assert items[0]["quantidade"] == 1.0
        assert items[0]["valor_unitario"] == 9.0

    def test_dedupe_by_sq_keeps_higher_score(self):
        toks = [
            {"y_position": 0, "x_position": 0, "x_end": 100, "text": "SQ.CODIGO DESC"},
            # sparse candidate for sq 01 (only total)
            {"y_position": 20, "x_position": 0, "x_end": 300, "text": "01 12345678 CAFE"},
            {"y_position": 20, "x_position": 620, "x_end": 690, "text": "9,00"},
            # richer candidate for sq 01 (qty+unit+total)
            {"y_position": 40, "x_position": 0, "x_end": 300, "text": "01 12345678 CAFE MELHOR"},
            {"y_position": 40, "x_position": 400, "x_end": 520, "text": "2UN X 4,50"},
            {"y_position": 40, "x_position": 620, "x_end": 690, "text": "9,00"},
        ]
        items = parse_items(toks, "gasto", "")
        assert len(items) == 1
        assert items[0]["item"] == "CAFE MELHOR"

    def test_structure_document_empty(self):
        doc = structure_document([])
        assert doc["tipo_documento"] == "erro"
        assert doc["confianca"] == 0.0

    def test_structure_document_confidence_all_or_nothing(self):
        doc = structure_document(self._receipt_tokens())
        assert doc["confianca"] == 1.0
        assert doc["tipo_documento"] == "gasto"
