"""HTML boilerplate strip + PDF XY-cut tests (M15-M17 + north-rule layout)."""

from __future__ import annotations

from ocr_service_ray.stages.html_extract import (
    extract_date_from_text,
    extract_items_from_text,
    extract_main_text,
    extract_total_from_text,
    parse_html_document,
)
from ocr_service_ray.stages.pdf_layout import extract_pdf_text, parse_pdf_records


class TestHtmlStrip:
    def test_drops_chrome_subtrees(self):
        html = (
            "<html><head><title>T</title><script>x()</script></head><body>"
            "<nav><a href='#'>Home</a></nav><header>LOJA</header>"
            "<p>conteudo principal util</p>"
            "<footer>rodape</footer></body></html>"
        )
        assert extract_main_text(html) == "conteudo principal util"

    def test_link_density_kills_linkfarm(self):
        html = (
            "<body><div><a href='/1'>aaa</a> <a href='/2'>bbb</a> <a href='/3'>ccc</a></div>"
            "<p>texto real com muitas palavras aqui</p></body>"
        )
        assert extract_main_text(html) == "texto real com muitas palavras aqui"

    def test_pipe_replaced_and_ws_collapsed(self):
        assert extract_main_text("<p>a|b   c</p>") == "a b c"

    def test_malformed_never_raises(self):
        assert isinstance(extract_main_text("<div><p>ok<"), str)
        assert extract_main_text("") == ""
        assert extract_main_text(None) == ""

    def test_inline_tags_do_not_split_blocks(self):
        assert extract_main_text("<p>um <b>dois</b> tres</p>") == "um dois tres"


class TestHtmlItems:
    TEXT = (
        "Arroz Integral (Código: 12345678) Qtde.: 2 UN: UN "
        "Vl. Unit.: 5,99 Vl. Total 11,98 "
        "Feijao (Código: 87654321) Qtde.: 1 UN: KG Vl. Unit.: 8,50 Vl. Total 8,50"
    )

    def test_items(self):
        items = extract_items_from_text(self.TEXT)
        assert len(items) == 2
        assert items[0]["item"] == "Arroz Integral"
        assert items[0]["codigo"] == "12345678"
        assert items[0]["quantidade"] == 2.0
        assert items[0]["valor_unitario"] == 5.99
        assert items[0]["valor_total"] == 11.98
        assert items[1]["unidade"] == "KG"

    def test_markdown_artifacts_tolerated(self):
        items = extract_items_from_text(self.TEXT.replace("Qtde.:", "**Qtde.:**"))
        assert len(items) == 2

    def test_date_and_total(self):
        t = "Emissão: 12/03/2024 ... Valor a pagar R$: 20,48"
        assert extract_date_from_text(t) == "12/03/2024"
        assert extract_total_from_text(t) == 20.48

    def test_parse_document_confidence(self):
        doc = parse_html_document(f"<body><p>{self.TEXT}</p></body>")
        assert doc["confianca"] == 1.0
        assert len(doc["itens"]) == 2
        assert parse_html_document("<p>nada</p>")["confianca"] == 0.0


class TestPdfLayout:
    def test_two_column_reading_order(self):
        # left column (x 0..100), right column (x 200..300), shuffled input
        recs = [
            "200 0 80 12 :: R1",
            "0 20 80 12 :: L2",
            "200 20 80 12 :: R2",
            "0 0 80 12 :: L1",
        ]
        assert extract_pdf_text("\n".join(recs)) == "L1\nL2\nR1\nR2"

    def test_single_column_lines(self):
        recs = ["0 0 40 12 :: a", "50 0 40 12 :: b", "0 30 40 12 :: c"]
        assert extract_pdf_text("\n".join(recs)) == "a b\nc"

    def test_malformed_records_skipped(self):
        assert parse_pdf_records("garbage\n1 2 3 :: x\na b c d :: y") == []
        assert extract_pdf_text("") == ""
        assert extract_pdf_text(None) == ""

    def test_y_band_split_before_columns_inside_band(self):
        # a full-width title above two columns: title first, then col order
        recs = [
            "0 0 300 12 :: TITLE",
            "0 40 80 12 :: L1",
            "200 40 80 12 :: R1",
            "0 60 80 12 :: L2",
        ]
        assert extract_pdf_text("\n".join(recs)) == "TITLE\nL1\nL2\nR1"
