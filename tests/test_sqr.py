"""SQR code (QR analog): codec, detection under degradation, engine API."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_service_ray.fixtures.gen import make_media_blob
from ocr_service_ray.fixtures.render import line_ground_truth, render_page
from ocr_service_ray.stages.ocr import preprocess as P
from ocr_service_ray.stages.ocr.engine import OcrEngine
from ocr_service_ray.stages.ocr.sqr import (
    decode_sqr,
    detect_sqr,
    encode_sqr,
    mask_sqr_region,
    stamp_sqr,
)

URL = "https://nfce.fazenda.sp.gov.br/qrcode?p=35240112345678901234550010000012341000012345|2|1|1|abcdef01"


@pytest.fixture(scope="module")
def engine():
    return OcrEngine()


class TestCodec:
    def test_roundtrip_plain(self):
        page = np.zeros((460, 600), dtype=bool)
        stamp_sqr(page, 250, 40, URL)
        assert decode_sqr(page) == URL

    def test_roundtrip_unicode(self):
        page = np.zeros((300, 400), dtype=bool)
        stamp_sqr(page, 100, 40, "préço R$ 1,50")
        assert decode_sqr(page) == "préço R$ 1,50"

    def test_no_code_none(self):
        assert decode_sqr(np.zeros((60, 60), dtype=bool)) is None
        assert detect_sqr(np.ones((10, 10), dtype=bool)) is None

    def test_rotated_deskewed_decodes(self):
        page = np.zeros((500, 640), dtype=bool)
        stamp_sqr(page, 280, 40, URL)
        # add text rows so deskew has structure to lock onto
        rng = np.random.default_rng(3)
        ink = P.binarize(
            __import__(
                "ocr_service_ray.stages.ocr.raster", fromlist=["decode"]
            ).decode(render_page([[(0, "LINHA DE REFERENCIA PARA DESKEW")]] * 3, rng))
        )
        page[: ink.shape[0], : min(ink.shape[1], 640)] |= ink[:, :640]
        rot = P.rotate_bool(page, 2.0)
        fixed, _ = P.deskew(rot)
        assert decode_sqr(fixed) == URL

    def test_noise_tolerant(self):
        rng = np.random.default_rng(0)
        page = np.zeros((460, 600), dtype=bool)
        stamp_sqr(page, 250, 40, URL)
        noisy = page ^ (rng.random(page.shape) < 0.005)
        assert decode_sqr(P.despeckle(noisy, min_neighbors=2)) == URL

    def test_mask_removes_block(self):
        page = np.zeros((460, 600), dtype=bool)
        stamp_sqr(page, 250, 40, URL)
        masked, payload = mask_sqr_region(page)
        assert payload == URL
        assert masked.sum() == 0

    def test_payload_too_long_raises(self):
        with pytest.raises(ValueError):
            encode_sqr("x" * 70000)


class TestEngineQr:
    def test_receipt_text_unaffected_by_code(self, engine):
        rng = np.random.default_rng([7, 3])
        payload, expected, _w, _h, qr, _plan = make_media_blob(rng, receipt=True)
        assert engine.recognize_lines(payload) == expected
        page = engine.extract_page(payload)
        assert page["qrcode"] == (qr or None)

    def test_extract_qrcode_reference_shape(self, engine):
        rng = np.random.default_rng(5)
        pay = render_page([[(0, "TEXTO ACIMA DO CODIGO")]], rng, sqr_payload=URL)
        r = engine.extract_qrcode(pay)
        assert r == [{"data": URL, "type": "QRCODE"}]

    def test_extract_qrcode_absent_and_garbage(self, engine):
        rng = np.random.default_rng(6)
        pay = render_page([[(0, "SEM CODIGO AQUI")]], rng)
        assert engine.extract_qrcode(pay) is None
        assert engine.extract_qrcode(b"junk") is None
        assert engine.extract_qrcode(None) is None
