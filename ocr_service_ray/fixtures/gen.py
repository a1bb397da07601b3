"""Deterministic synthetic corpus generator (FIXTURES.md).

Self-oracling: for every document it emits, the generator knows the
exact span sequence the pipeline must produce, and writes it to the
``expected`` table. The reference ships no test data at all
(/root/reference/tests/ holds only .gitkeep; .gitignore:51-54 excludes
the author's private golden images), so correctness is pinned entirely
by this generator + the span-sequence-equality invariant from
BASELINE.json.

Layout contract with the OCR engine (see stages/ocr/):
- segments on one rendered line are >= 18 px apart (word split threshold)
- receipt columns are >= 42 px apart (column-valley threshold 24 px)
- rendered words avoid the COMMON_CORRECTIONS triggers so token
  normalization is the identity on ground-truth text

Determinism: per-doc RNG = ``default_rng([seed, global_doc_index])``;
regeneration is byte-identical (FIXTURES.md §7).

Tables written under ``out_root`` via the storage adapter layout:
  docs/part=<p>/data.parquet      (doc_id, spans)           — pipeline input
  blobs/part=<p>/data.parquet     (media_ref, bytes, w, h)  — media sidecar
  expected/part=<p>/data.parquet  (doc_id, spans)           — the oracle
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..core import storage
from ..core.schema import BLOB_SCHEMA, DOC_SCHEMA
from ..ops import textops as T
from ..stages.ocr import raster
from .render import CHAR_ADV, line_ground_truth, render_page

# Receipt column geometry, in glyph-advance units so it scales with the
# font: left text may use up to 25 glyph cells (12-char "NN NNNNNNNN "
# prefix + <=13-char desc), leaving >= 3 cells (> the column-valley
# minimum) before the qty column; qty <= 13 cells before the total.
COL_QTY_X = 28 * CHAR_ADV
COL_TOT_X = 44 * CHAR_ADV

# A-Z-only words, free of correction-table triggers (ZER0/I0G/OUOS/UOS/UH/SUIFT).
WORDS = (
    "ARROZ FEIJAO ACUCAR CAFE LEITE PAO QUEIJO PRESUNTO MANTEIGA SAL "
    "FARINHA MACARRAO TOMATE BATATA CEBOLA ALFACE LARANJA BANANA MACA UVA "
    "CARNE FRANGO PEIXE LINGUICA SABONETE DETERGENTE PAPEL TOALHA AGUA SUCO "
    "REFRIGERANTE BISCOITO BOLACHA CHOCOLATE SORVETE PIPOCA MILHO ERVILHA "
    "AZEITE VINAGRE MOSTARDA MAIONESE KETCHUP PIMENTA ALHO GENGIBRE CANELA "
    "AVEIA GRANOLA IOGURTE REQUEIJAO GELEIA MEL AMENDOIM CASTANHA NOZES "
    "PASSAS COCO LIMAO MELANCIA ABACAXI MORANGO PESSEGO AMEIXA MANGA"
).split()

BOILER_LINKS = ("Home", "Produtos", "Contato", "Login", "Mapa", "Ajuda", "Blog")
KIND_PROBS = (("text", 0.55), ("html", 0.20), ("pdf", 0.10), ("media", 0.15))

# pdf pseudo-page geometry (token grid; min_gap_x=40 < column gap 60)
_PDF_COL_X = (0, 360)
_PDF_COL_W = 300
_PDF_LINE_H = 12
_PDF_LINE_ADV = 20


def _pick_words(rng: np.random.Generator, n: int) -> list[str]:
    return [WORDS[int(i)] for i in rng.integers(0, len(WORDS), n)]


def _sentence(rng: np.random.Generator, lo: int = 4, hi: int = 12) -> str:
    return " ".join(_pick_words(rng, int(rng.integers(lo, hi + 1))))


# ----------------------------------------------------------------------
# Per-kind payload + ground-truth builders


def make_text_span(rng: np.random.Generator) -> tuple[str, str]:
    raw = _sentence(rng).lower()
    # sprinkle normalization fodder: '×' and double spaces
    if rng.random() < 0.3:
        raw = raw.replace(" ", "  ", 1)
    if rng.random() < 0.2:
        raw += " 2×3"
    return raw, T.norm_text(raw)


def make_html_span(rng: np.random.Generator) -> tuple[str, str]:
    """(html payload, expected main text)."""
    main_parts: list[str] = [_sentence(rng, 6, 14)]
    if rng.random() < 0.5:  # structured item block (nfce_parser semantics)
        n_items = int(rng.integers(1, 4))
        rows = []
        for _ in range(n_items):
            desc = " ".join(_pick_words(rng, 2)).title()
            code = int(rng.integers(10**7, 10**8))
            qtd = int(rng.integers(1, 9))
            vu = int(rng.integers(100, 9999)) / 100
            vt = round(qtd * vu, 2)
            vu_s = f"{vu:.2f}".replace(".", ",")
            vt_s = f"{vt:.2f}".replace(".", ",")
            rows.append(
                f"{desc} (Código: {code}) Qtde.: {qtd} UN: UN "
                f"Vl. Unit.: {vu_s} Vl. Total {vt_s}"
            )
        main_parts.append(" ".join(rows))
    if rng.random() < 0.4:
        tot_s = f"{int(rng.integers(1000, 99999)) / 100:.2f}".replace(".", ",")
        main_parts.append(f"Emissão: {_date(rng)} Valor a pagar R$: {tot_s}")
    main_parts.append(_sentence(rng, 5, 10))

    nav = " ".join(f'<a href="#{w}">{w}</a>' for w in BOILER_LINKS[: int(rng.integers(3, 7))])
    linkfarm = " ".join(
        f'<a href="/p/{i}">{WORDS[int(rng.integers(0, len(WORDS)))].lower()}</a>'
        for i in range(int(rng.integers(4, 9)))
    )
    body_main = "".join(f"<p>{p}</p>" for p in main_parts)
    html = (
        "<html><head><title>pagina</title><script>var x=1;function f(){return 2;}</script>"
        "<style>.m{color:red}</style></head>"
        f"<body><header><h1>LOJA</h1></header><nav>{nav}</nav>"
        f'<div class="main">{body_main}</div>'
        f'<aside>promo</aside><div class="links">{linkfarm}</div>'
        f"<footer><a href='#'>contato</a> (c) loja</footer></body></html>"
    )
    import re as _re

    expected = _re.sub(r"\s+", " ", " ".join(main_parts)).strip()
    return html, expected


def _date(rng: np.random.Generator) -> str:
    return f"{int(rng.integers(1, 29)):02d}/{int(rng.integers(1, 13)):02d}/{int(rng.integers(2020, 2026))}"


def make_pdf_span(rng: np.random.Generator) -> tuple[str, str]:
    """(pdf pseudo-positional payload, expected XY-cut reading order)."""
    n_lines = int(rng.integers(3, 7))
    records: list[str] = []
    col_lines: list[list[str]] = [[], []]
    for col, x0 in enumerate(_PDF_COL_X):
        for li in range(n_lines):
            words = _pick_words(rng, int(rng.integers(2, 5)))
            x = x0
            y = li * _PDF_LINE_ADV
            parts = []
            for wtext in words:
                wpx = len(wtext) * 8
                if x + wpx > x0 + _PDF_COL_W:
                    break
                records.append(f"{x} {y} {wpx} {_PDF_LINE_H} :: {wtext}")
                parts.append(wtext)
                x += wpx + 16
            if parts:
                col_lines[col].append(" ".join(parts))
    # shuffle record order (layout must not depend on input order)
    order = rng.permutation(len(records))
    payload = "\n".join(records[i] for i in order)
    expected = "\n".join(col_lines[0] + col_lines[1])
    return payload, expected


def make_media_blob(
    rng: np.random.Generator, receipt: bool
) -> tuple[bytes, str, int, int, str]:
    """(SYNR payload, expected text, width, height, qr_payload or "")."""
    lines: list[list[tuple[int, str]]] = []
    qr = ""
    if receipt:
        lines.append([(0, " ".join(_pick_words(rng, 2)) + " LTDA")])
        lines.append([(0, f"EMISSAO: {_date(rng)}")])
        lines.append([(0, "SQ.CODIGO DESC")])
        n_items = int(rng.integers(1, 5))
        total = 0.0
        for i in range(n_items):
            # left segment is "NN NNNNNNNN <desc>" (12-char prefix); cap at
            # 25 chars total so its ink ends >= 3 glyph cells before the
            # qty column (column-gap contract with derive_column_cuts)
            desc = " ".join(_pick_words(rng, int(rng.integers(1, 3))))[:13].strip()
            code = int(rng.integers(10**7, 10**8))
            qtd = int(rng.integers(1, 10))
            vu = int(rng.integers(100, 9999)) / 100
            vt = round(qtd * vu, 2)
            total += vt
            left = f"{i + 1:02d} {code:08d} {desc}"
            mid = f"{qtd}UN X {vu:.2f}".replace(".", ",")
            right = f"{vt:.2f}".replace(".", ",")
            lines.append([(0, left), (COL_QTY_X, mid), (COL_TOT_X, right)])
        lines.append([(0, "VALOR TOTAL"), (COL_TOT_X, f"{total:.2f}".replace(".", ","))])
        if rng.random() < 0.7:  # NFC-e receipts carry the access-key QR
            chave = "".join(str(int(d)) for d in rng.integers(0, 10, 44))
            tag = "".join("0123456789abcdef"[int(i)] for i in rng.integers(0, 16, 8))
            qr = f"https://nfce.fazenda.sp.gov.br/qrcode?p={chave}|2|1|1|{tag}"
    else:
        for _ in range(int(rng.integers(2, 6))):
            lines.append([(0, " ".join(_pick_words(rng, int(rng.integers(2, 5))))[:50])])
    rot = float(rng.choice((0.0, 0.0, 1.5, -1.5, 3.0, -3.0)))
    noise = float(rng.choice((0.0, 0.0, 0.005)))
    payload = render_page(
        lines, rng, rotate_deg=rot, noise_rate=noise, sqr_payload=qr or None
    )
    expected = "\n".join(line_ground_truth(segs) for segs in lines)
    img = raster.decode(payload)
    h, w = img.shape
    return payload, expected, w, h, qr


# ----------------------------------------------------------------------
# Corpus assembly

SCALES = {
    "tiny": (2, 8),
    "small": (8, 256),
    "medium": (16, 1024),
    "bench": (32, 2048),
}


#: bump when generated bytes change for the same (scale, seed, profile)
#: — cached corpora under /tmp are keyed by this so stale caches from a
#: prior code version can never poison a run
GEN_VERSION = 1


def generate_corpus(
    out_root: str,
    seed: int = 42,
    n_parts: int = 8,
    docs_per_part: int = 256,
    profile: str = "default",
    processes: int | None = None,
) -> dict:
    """Write docs/blobs/expected tables; returns summary paths + counts.

    Partitions are generated independently (per-doc RNG is seeded by the
    GLOBAL doc index, so the output is byte-identical regardless of the
    process pool size) and in parallel when ``processes`` > 1.
    """
    os.makedirs(out_root, exist_ok=True)
    docs_root = os.path.join(out_root, "docs")
    blobs_root = os.path.join(out_root, "blobs")
    expected_root = os.path.join(out_root, "expected")
    if processes is None:
        processes = min(16, os.cpu_count() or 1, n_parts)
    try:
        import ray

        if ray.is_initialized():
            # forking a Ray-connected process crashes in gRPC/absl;
            # generate serially when called inside a Ray session
            processes = 1
    except ImportError:
        pass
    args = [
        (out_root, seed, part, docs_per_part, profile) for part in range(n_parts)
    ]
    if processes > 1 and n_parts > 1:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        with ctx.Pool(processes) as pool:
            counts = pool.map(_generate_part, args)
    else:
        counts = [_generate_part(a) for a in args]
    return {
        "docs": docs_root,
        "blobs": blobs_root,
        "expected": expected_root,
        "n_parts": n_parts,
        "n_docs": sum(c[0] for c in counts),
        "n_spans": sum(c[1] for c in counts),
        "n_blobs": sum(c[2] for c in counts),
    }


def _generate_part(args: tuple) -> tuple[int, int, int]:
    """Generate one partition of docs/blobs/expected; returns counts."""
    out_root, seed, part, docs_per_part, profile = args
    docs_root = os.path.join(out_root, "docs")
    blobs_root = os.path.join(out_root, "blobs")
    expected_root = os.path.join(out_root, "expected")
    n_docs = 0
    n_spans = 0
    n_blobs = 0
    if True:  # preserved indentation of the per-part body
        doc_rows: list[dict] = []
        exp_rows: list[dict] = []
        blob_rows: list[dict] = []
        for d in range(docs_per_part):
            gidx = part * docs_per_part + d
            rng = np.random.default_rng([seed, gidx])
            doc_id = f"doc-{seed}-{gidx:08d}"
            in_spans: list[dict] = []
            out_spans: list[dict] = []
            if profile == "skewed" and rng.random() < 0.01:
                kinds = ["media"] * 50
            elif profile == "skewed":
                kinds = ["text"] * int(rng.integers(1, 5))
            else:
                r = rng.random(int(rng.integers(1, 7)))
                kinds = []
                for v in r:
                    acc = 0.0
                    for kind, p in KIND_PROBS:
                        acc += p
                        if v < acc:
                            kinds.append(kind)
                            break
                    else:
                        kinds.append("text")
            for off, kind in enumerate(kinds):
                if kind == "text":
                    payload, exp = make_text_span(rng)
                    in_spans.append(_span("text", payload, "", off))
                    out_spans.append(_span("text", exp, "", off))
                elif kind == "html":
                    payload, exp = make_html_span(rng)
                    in_spans.append(_span("html", payload, "", off))
                    out_spans.append(_span("text", exp, "", off))
                elif kind == "pdf":
                    payload, exp = make_pdf_span(rng)
                    in_spans.append(_span("pdf", payload, "", off))
                    out_spans.append(_span("text", exp, "", off))
                else:  # media
                    ref = f"blob-{part:04d}-{gidx:08d}-{off:03d}"
                    u = rng.random()
                    if u < 0.02:  # corrupt blob
                        blob_rows.append(
                            {"media_ref": ref, "bytes": b"SYNR 10 10\nshort",
                             "width": 10, "height": 10, "qr_payload": ""}
                        )
                        in_spans.append(_span("media", "", ref, off))
                        out_spans.append(_span("erro", "", ref, off))
                    elif u < 0.025:  # dangling ref (no blob row at all)
                        in_spans.append(_span("media", "", ref, off))
                        out_spans.append(_span("erro", "", ref, off))
                    else:
                        receipt = rng.random() < 0.3
                        payload, exp, w, h, qr = make_media_blob(rng, receipt)
                        blob_rows.append(
                            {"media_ref": ref, "bytes": payload, "width": w,
                             "height": h, "qr_payload": qr}
                        )
                        in_spans.append(_span("media", "", ref, off))
                        out_spans.append(_span("text", exp, ref, off))
                    n_blobs += 1
            doc_rows.append({"doc_id": doc_id, "spans": in_spans})
            exp_rows.append({"doc_id": doc_id, "spans": out_spans})
            n_docs += 1
            n_spans += len(in_spans)
        storage.write_part(docs_root, part, _doc_table(doc_rows))
        storage.write_part(expected_root, part, _doc_table(exp_rows))
        storage.write_part(blobs_root, part, _blob_table(blob_rows))
    return n_docs, n_spans, n_blobs


def generate_scale(out_root: str, scale: str = "tiny", seed: int = 42, profile: str = "default") -> dict:
    n_parts, docs_per_part = SCALES[scale]
    return generate_corpus(out_root, seed=seed, n_parts=n_parts, docs_per_part=docs_per_part, profile=profile)


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _doc_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def _blob_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=BLOB_SCHEMA)
