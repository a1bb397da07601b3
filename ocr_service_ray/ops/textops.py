"""Scalar text/number/date functions shared by all extraction stages.

Reimplements (from scratch, behavior-pinned by unit tests) the scalar
semantics of the reference:

- text normalization / correction table  (/root/reference/app/ocr_engine.py:39-47,374-379)
- description cleaner                    (/root/reference/app/ocr_engine.py:394-401)
- pt-BR decimal parsing                  (/root/reference/app/ocr_engine.py:381-392;
                                          duplicated at app/nfce_parser.py:136-148 —
                                          we keep ONE implementation)
- date extraction                        (/root/reference/app/ocr_engine.py:403-412) —
  WITHOUT the ``datetime.now()`` fallback: determinism is mandatory for the
  span-equality invariant and resumability, so a missing date is ``None``.
- money token parsing w/ OCR-garble repair
                                         (/root/reference/app/ocr_engine.py:294-320)
- money/date utilities of the dead-code TextProcessor
                                         (/root/reference/app/utils.py:8-61) —
  adopted as ``extract_money_values`` / ``extract_dates`` minus ``now()``.
"""

from __future__ import annotations

import re

# Correction table — semantics of /root/reference/app/ocr_engine.py:39-47.
COMMON_CORRECTIONS: tuple[tuple[str, str], ...] = (
    ("ZER0", "ZERO"),
    ("I0G", "IOG"),
    ("OUOS", "OVOS"),
    ("UOS", "OVOS"),
    ("UH", "UN"),
    ("1Ux", "1UNx"),
    ("SUIFT", "SWIFT"),
)

_WS = re.compile(r"\s+")
_DESC_CHARSET = re.compile(r"[^A-Z0-9À-Ü\s.,/-]")
RE_MONEY = re.compile(r"\d+(?:[.,]\d{2})")
_NON_DIGIT = re.compile(r"[^0-9]")
_DATE_EMISSAO = re.compile(r"emiss[aã]o[:\s]*(\d{2}/\d{2}/\d{4})", re.IGNORECASE)
_DATE_ANY = re.compile(r"(\d{2}/\d{2}/\d{4})")
_DATE_LOOSE = re.compile(r"\b(\d{2}[/-]\d{2}[/-]\d{4})\b|\b(\d{2}[/-]\d{2}[/-]\d{2})\b")
_MONEY_LOOSE = (
    re.compile(r"R\$?\s*(\d{1,3}(?:\.\d{3})*,\d{2})", re.IGNORECASE),
    re.compile(r"R\$?\s*(\d+,\d{2})", re.IGNORECASE),
    re.compile(r"\b(\d+\.\d{2})\b"),
)

# Item-region markers — /root/reference/app/ocr_engine.py:15-27.
KEYWORDS_VENDA = ("recebido", "pix recebido", "crédito em conta", "depósito", "recibo")
STOP_HINTS = (
    "QTD. TOTAL DE ITENS",
    "QTD TOTAL DE ITENS",
    "VALOR TOTAL",
    "CARTAO",
    "CARTÃO",
    "CONSUMIDOR",
    "CONSULTE PELA CHAVE",
    "CHAVE DE ACESSO",
    "PROTOCOLO",
)

# Row parsers — /root/reference/app/ocr_engine.py:29-37.
RE_ITEM_HEADER = re.compile(r"^\s*(?P<sq>\d{2})\s+(?P<code>\d{8,14})(?P<desc>.*)$")
RE_QTD_X_UNIT = re.compile(
    r"(?P<qtd>\d+(?:[.,]\d+)?)\s*(?P<un>[A-Z]{1,3})\s*[xX]\s*(?P<vl>\d+(?:[.,]\d{2}))",
    re.IGNORECASE,
)


def norm_text(s: str | None) -> str:
    """Normalize a token: ``×``→``X``, collapse whitespace, corrections.

    Semantics of /root/reference/app/ocr_engine.py:374-379.
    """
    s = (s or "").replace("×", "X")
    s = _WS.sub(" ", s).strip()
    for wrong, right in COMMON_CORRECTIONS:
        s = s.replace(wrong, right)
    return s


def clean_desc(desc: str | None) -> str:
    """Uppercase + charset-strip an item description.

    Semantics of /root/reference/app/ocr_engine.py:394-401.
    """
    d = _WS.sub(" ", (desc or "").upper()).strip()
    d = _DESC_CHARSET.sub("", d)
    for wrong, right in COMMON_CORRECTIONS:
        d = d.replace(wrong, right)
    d = d.strip(" -")
    return d if d else "ITEM DESCONHECIDO"


def to_float(s: str | None) -> float | None:
    """pt-BR decimal: ``"1.234,56"`` → 1234.56; None on garbage.

    Semantics of /root/reference/app/ocr_engine.py:381-392.
    """
    if not s:
        return None
    s = str(s).strip().replace(" ", "")
    if s.count(",") == 1 and s.count(".") >= 1:
        s = s.replace(".", "").replace(",", ".")
    else:
        s = s.replace(",", ".")
    try:
        return float(s)
    except ValueError:
        return None


def extract_date(text: str) -> str | None:
    """First ``emissão: dd/mm/yyyy`` else first ``dd/mm/yyyy``; None if absent.

    Reference (/root/reference/app/ocr_engine.py:403-412) falls back to
    ``datetime.now()`` — deliberately NOT reproduced (nondeterministic).
    """
    m = _DATE_EMISSAO.search(text)
    if m:
        return m.group(1)
    m = _DATE_ANY.search(text)
    return m.group(1) if m else None


def parse_money_tokens(raw: str) -> float | None:
    """Parse a money amount from right-column text, repairing OCR garble.

    Last ``\\d+[.,]\\d{2}`` match wins; otherwise strip to digits and
    reinterpret 3 digits as ``d,dd`` / 4 digits as ``dd,dd``.
    Semantics of /root/reference/app/ocr_engine.py:294-320.
    """
    if not raw:
        return None
    monies = RE_MONEY.findall(raw)
    if monies:
        return to_float(monies[-1])
    cleaned = _NON_DIGIT.sub("", raw.replace("'", "").replace("`", "").replace(" ", ""))
    if len(cleaned) == 3:
        return to_float(f"{cleaned[0]},{cleaned[1:]}")
    if len(cleaned) == 4:
        return to_float(f"{cleaned[:-2]},{cleaned[-2:]}")
    return None


def classify_document(full_text: str) -> str:
    """``venda`` iff any sale keyword occurs, else ``gasto``.

    Semantics of /root/reference/app/ocr_engine.py:162-163.
    """
    low = full_text.lower()
    return "venda" if any(k in low for k in KEYWORDS_VENDA) else "gasto"


def item_score(item: dict) -> int:
    """Non-null field count used as the dedupe quality tie-break.

    Semantics of /root/reference/app/ocr_engine.py:322-332.
    """
    score = 0
    if item.get("item"):
        score += 1
    for k in ("quantidade", "valor_unitario", "valor_total"):
        if item.get(k) is not None:
            score += 1
    return score


def extract_money_values(text: str) -> list[float]:
    """All money-looking values in [0.01, 999999.99], deduped + sorted.

    Semantics of the dead-code /root/reference/app/utils.py:8-40.
    """
    out: set[float] = set()
    for pat in _MONEY_LOOSE:
        for mt in pat.findall(text):
            if "," in mt:
                val = to_float(mt)
            else:
                try:
                    val = float(mt)
                except ValueError:
                    val = None
            if val is not None and 0.01 <= val <= 999999.99:
                out.add(val)
    return sorted(out)


def extract_dates(text: str) -> list[str]:
    """All DD/MM/YYYY-ish dates normalized; 2-digit years expanded to 20yy.

    Semantics of /root/reference/app/utils.py:42-86 minus the ``now()``
    fallbacks: invalid dates are skipped instead.
    """
    out: list[str] = []
    for m in _DATE_LOOSE.finditer(text):
        raw = (m.group(1) or m.group(2)).replace("-", "/")
        day, month, year = raw.split("/")
        try:
            if not (1 <= int(day) <= 31 and 1 <= int(month) <= 12):
                continue
        except ValueError:
            continue
        if len(year) == 2:
            year = "20" + year
        out.append(f"{day.zfill(2)}/{month.zfill(2)}/{year}")
    return out


def clean_item_name(text: str) -> str:
    """Strip money values / trailing numbers / ``**`` runs from an item name.

    Semantics of /root/reference/app/utils.py:88-97.
    """
    text = re.sub(r"R\$?\s*[\d.,]+", "", text, flags=re.IGNORECASE)
    text = re.sub(r"\s+\d+$", "", text)
    text = re.sub(r"[*]{2,}", "", text)
    return text.strip()


def clean_url(url: str) -> str:
    """Drop the ``|suffix`` of NFC-e QR payloads (app/nfce_parser.py:29-30)."""
    return url.split("|")[0] if "|" in url else url
