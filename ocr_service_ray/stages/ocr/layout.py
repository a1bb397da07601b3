"""Spatial layout parsing: y-clustering, column split, item extraction.

Reimplements (semantics, not code) the reference's structuring pass:

- greedy 1-D y-agglomeration with running-mean centroid
  (/root/reference/app/ocr_engine.py:334-354)
- item-region banding between the ``SQ.CODIGO`` marker and the first
  stop hint (app/ocr_engine.py:178-193)
- three-column split; reference uses fixed pixel cuts 620/900
  (app/ocr_engine.py:196-198) — we also support deriving cuts from
  x-histogram valleys ("auto" mode) because our rasters are not fixed
  to the author's phone camera geometry
- row regexes + imputation chain + dedupe-by-sq with quality tie-break
  (app/ocr_engine.py:209-292)
- document classification + confidence (app/ocr_engine.py:152-173)
"""

from __future__ import annotations

from typing import Any

from ...core.config import DEFAULT_CONFIG, PipelineConfig
from ...ops import textops as T

_X_SENTINEL = 10**9


def sort_tokens(tokens: list[dict]) -> list[dict]:
    """(y, x) sort with null-x last — app/ocr_engine.py:103 semantics."""
    return sorted(
        tokens,
        key=lambda t: (
            t["y_position"],
            t["x_position"] if t.get("x_position") is not None else _X_SENTINEL,
        ),
    )


def group_by_y(tokens: list[dict], y_tol: int = 6) -> list[dict]:
    """Greedy agglomerative line grouping with drifting integer centroid.

    Order-sensitive exactly like the reference (app/ocr_engine.py:334-354):
    tokens are visited in (y, x) order, each joins the FIRST group whose
    centroid is within ``y_tol``, and the centroid drifts via
    ``(y_ref + y) // 2`` integer halving.
    """
    groups: list[dict] = []
    for t in sort_tokens(tokens):
        y = int(t["y_position"])
        for g in groups:
            if abs(y - g["y_ref"]) <= y_tol:
                g["tokens"].append(t)
                g["y_ref"] = int((g["y_ref"] + y) / 2)
                break
        else:
            groups.append({"y_ref": y, "tokens": [t]})
    for g in groups:
        g["tokens"].sort(
            key=lambda t: t["x_position"] if t.get("x_position") is not None else _X_SENTINEL
        )
    groups.sort(key=lambda g: g["y_ref"])
    return groups


def item_band(tokens: list[dict]) -> list[dict]:
    """Tokens between the ``SQ.CODIGO`` marker and the first stop hint.

    Semantics of app/ocr_engine.py:178-193 (start = marker y + 5,
    end = stop y - 5, unbounded when absent).
    """
    start_y = 0
    for t in tokens:
        up = (t.get("text") or "").upper()
        if "SQ.CODIGO" in up or "SQ. CODIGO" in up:
            start_y = t.get("y_position", 0) + 5
            break
    end_y = _X_SENTINEL
    for t in tokens:
        up = (t.get("text") or "").upper()
        if any(h in up for h in T.STOP_HINTS):
            end_y = t.get("y_position", _X_SENTINEL) - 5
            break
    return [t for t in tokens if start_y <= t["y_position"] <= end_y]


def derive_column_cuts(
    tokens: list[dict],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    min_valley: int = 24,
) -> tuple[int, int]:
    """(mid_cut, right_cut) x thresholds.

    "auto" is an x-projection XY-cut: take the union of token ink
    intervals ``[x_position, x_end)`` across the whole band and find the
    two widest zero-occupancy valleys (>= ``min_valley`` px, wider than
    any intra-column word gap); cuts are the valley midpoints. Falls back
    to the reference's fixed pixel cuts (app/ocr_engine.py:196-198) when
    tokens lack extents or fewer than two valleys exist.
    """
    if cfg.column_mode != "auto":
        return cfg.x_mid_min, cfg.x_right_min
    ivals = sorted(
        (int(t["x_position"]), int(t["x_end"]))
        for t in tokens
        if t.get("x_position") is not None and t.get("x_end")
    )
    if len(ivals) < 2:
        return cfg.x_mid_min, cfg.x_right_min
    # merge the interval union, collect internal valleys
    valleys = []  # (width, midpoint)
    cur_end = ivals[0][1]
    for a, b in ivals[1:]:
        if a > cur_end:
            if a - cur_end >= min_valley:
                valleys.append((a - cur_end, (a + cur_end) // 2))
            cur_end = b
        else:
            cur_end = max(cur_end, b)
    if not valleys:
        return cfg.x_mid_min, cfg.x_right_min
    if len(valleys) == 1:
        # two-column row (desc | trailing value): treat the trailing
        # column as the money column (mid band is empty)
        cut = valleys[0][1]
        return cut, cut
    valleys.sort(reverse=True)
    top2 = sorted([valleys[0][1], valleys[1][1]])
    return top2[0], top2[1]


def parse_items(
    tokens: list[dict],
    tipo: str,
    full_text: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict[str, Any]]:
    """Item extraction: band -> y-group -> column regexes -> impute -> dedupe.

    Field-for-field semantics of app/ocr_engine.py:175-292, with the
    ``datetime.now()`` date fallback removed (determinism) and optional
    auto column cuts.
    """
    data_compra = T.extract_date(full_text)
    band = item_band(tokens)
    groups = group_by_y(band, y_tol=cfg.y_tol)
    mid_cut, right_cut = derive_column_cuts(band, cfg)

    def _x(t: dict) -> int:
        return t.get("x_position") or 0

    def right_text_of(g: dict) -> str:
        return T.norm_text(" ".join(t["text"] for t in g["tokens"] if _x(t) >= right_cut))

    items_by_sq: dict[str, dict] = {}
    for i, g in enumerate(groups):
        left = [t for t in g["tokens"] if _x(t) < mid_cut]
        if not left:
            continue
        left_text = T.norm_text(" ".join(t["text"] for t in left))
        m = T.RE_ITEM_HEADER.match(left_text)
        if not m:
            continue
        sq = m.group("sq")
        desc = T.clean_desc(m.group("desc") or "")

        mid_text = T.norm_text(
            " ".join(t["text"] for t in g["tokens"] if mid_cut <= _x(t) < right_cut)
        )
        q = T.RE_QTD_X_UNIT.search(mid_text) or T.RE_QTD_X_UNIT.search(left_text)
        quantidade = T.to_float(q.group("qtd")) if q else None
        valor_unitario = T.to_float(q.group("vl")) if q else None

        valor_total = T.parse_money_tokens(right_text_of(g))
        if valor_total is None and i + 1 < len(groups):
            nxt = groups[i + 1]
            if nxt["y_ref"] - g["y_ref"] <= cfg.next_group_max_dy:
                valor_total = T.parse_money_tokens(right_text_of(nxt))
        if valor_total is None and valor_unitario is not None:
            if quantidade is None or abs(quantidade - 1.0) < 1e-6:
                valor_total = valor_unitario

        if not desc or desc == "ITEM DESCONHECIDO":
            continue
        if valor_total is None:
            continue
        if quantidade is None:
            quantidade = 1.0
        if valor_unitario is None and quantidade > 0:
            valor_unitario = round(valor_total / quantidade, 2)

        candidate = {
            "sq": sq,
            "item": desc,
            "quantidade": float(quantidade),
            "valor_unitario": float(valor_unitario) if valor_unitario is not None else None,
            "valor_total": float(valor_total),
            "data_compra": data_compra if tipo == "gasto" else None,
            "data_venda": data_compra if tipo == "venda" else None,
        }
        prev = items_by_sq.get(sq)
        if prev is None or T.item_score(candidate) >= T.item_score(prev):
            items_by_sq[sq] = candidate

    items = list(items_by_sq.values())
    try:
        items.sort(key=lambda it: int(it["sq"]))
    except (ValueError, TypeError):
        pass
    return items


def structure_document(tokens: list[dict]) -> dict[str, Any]:
    """Token list -> structured document (classify + items + confidence).

    Semantics of app/ocr_engine.py:152-173; ``confianca`` is the
    all-or-nothing 1.0/0.0 of app/ocr_engine.py:172.
    """
    if not tokens:
        return {
            "tipo_documento": "erro",
            "itens": [],
            "mensagem": "Nenhuma linha OCR encontrada",
            "confianca": 0.0,
        }
    full_text = "\n".join(t.get("text", "") for t in tokens)
    tipo = T.classify_document(full_text)
    itens = parse_items(tokens, tipo, full_text)
    return {
        "tipo_documento": tipo,
        "itens": itens,
        "mensagem": None if itens else "Nenhum item detectado",
        "confianca": 1.0 if itens else 0.0,
    }
