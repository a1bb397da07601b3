"""Unit tests pinning the scalar semantics of the reference.

Each case cites the reference behavior it pins (SURVEY.md §2.8).
"""

from __future__ import annotations

from ocr_service_ray.ops import textops as T


class TestToFloat:
    # /root/reference/app/ocr_engine.py:381-392
    def test_thousands_and_decimal_comma(self):
        assert T.to_float("1.234,56") == 1234.56

    def test_plain_comma(self):
        assert T.to_float("15,9") == 15.9

    def test_plain_dot(self):
        assert T.to_float("15.90") == 15.9

    def test_integer(self):
        assert T.to_float("42") == 42.0

    def test_spaces_stripped(self):
        assert T.to_float(" 1 234,5 ") == 1234.5

    def test_garbage(self):
        assert T.to_float("abc") is None
        assert T.to_float("") is None
        assert T.to_float(None) is None


class TestNormText:
    # /root/reference/app/ocr_engine.py:374-379 + corrections table :39-47
    def test_multiplication_sign(self):
        assert T.norm_text("2×3") == "2X3"

    def test_whitespace_collapse(self):
        assert T.norm_text("  a\t b\n c ") == "a b c"

    def test_corrections(self):
        assert T.norm_text("ZER0 UH") == "ZERO UN"
        assert T.norm_text("SUIFT") == "SWIFT"

    def test_none(self):
        assert T.norm_text(None) == ""


class TestCleanDesc:
    # /root/reference/app/ocr_engine.py:394-401
    def test_uppercase_and_strip(self):
        assert T.clean_desc("arroz tipo 1") == "ARROZ TIPO 1"

    def test_charset_filter(self):
        assert T.clean_desc("caf~é! 2*") == "CAFÉ 2"

    def test_trailing_dash_space(self):
        assert T.clean_desc("LEITE -") == "LEITE"

    def test_empty_default(self):
        assert T.clean_desc("") == "ITEM DESCONHECIDO"
        assert T.clean_desc("~!@") == "ITEM DESCONHECIDO"


class TestMoneyGarble:
    # /root/reference/app/ocr_engine.py:294-320
    def test_normal(self):
        assert T.parse_money_tokens("11,98") == 11.98

    def test_last_wins(self):
        assert T.parse_money_tokens("1,00 2,00 3,50") == 3.5

    def test_three_digit_repair(self):
        assert T.parse_money_tokens("66'9") == 6.69

    def test_four_digit_repair(self):
        assert T.parse_money_tokens("1 2 9 9 ") == 12.99

    def test_unrepairable(self):
        assert T.parse_money_tokens("abcde") is None
        assert T.parse_money_tokens("") is None


class TestDates:
    # /root/reference/app/ocr_engine.py:403-412 (minus the now() fallback)
    def test_emissao_priority(self):
        text = "blah 01/01/2020 Emissão: 12/03/2024 x"
        assert T.extract_date(text) == "12/03/2024"

    def test_any_date(self):
        assert T.extract_date("compra em 05/06/2023 ok") == "05/06/2023"

    def test_missing_is_none_not_now(self):
        assert T.extract_date("sem data alguma") is None

    def test_extract_dates_two_digit_year(self):
        # /root/reference/app/utils.py:63-86 minus now() fallback
        assert T.extract_dates("em 05/06/23 e 01/02/2024") == [
            "05/06/2023",
            "01/02/2024",
        ]

    def test_extract_dates_invalid_skipped(self):
        assert T.extract_dates("99/99/2024") == []


class TestMoneyValues:
    # /root/reference/app/utils.py:8-40 (dead code adopted)
    def test_dedup_sorted_range(self):
        vals = T.extract_money_values("R$ 5,00 e R$ 3,50 e R$5,00 e 0,001")
        assert vals == [3.5, 5.0]


class TestClassify:
    # /root/reference/app/ocr_engine.py:162-163
    def test_venda(self):
        assert T.classify_document("PIX RECEBIDO ontem") == "venda"

    def test_gasto(self):
        assert T.classify_document("cupom fiscal qualquer") == "gasto"


class TestItemScore:
    # /root/reference/app/ocr_engine.py:322-332
    def test_score_counts_nonnull(self):
        assert T.item_score({"item": "X", "quantidade": 1.0, "valor_unitario": None, "valor_total": 2.0}) == 3
        assert T.item_score({}) == 0


class TestCleanUrl:
    # /root/reference/app/nfce_parser.py:29-30
    def test_pipe_suffix(self):
        assert T.clean_url("http://x?p=1|2|abc") == "http://x?p=1"
        assert T.clean_url("http://x") == "http://x"
