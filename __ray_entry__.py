"""Driver contract for the graft builder (Ray Data target).

Delegates to ocr_service_ray.pipeline.entry_api. The driver owns the
Ray session: nothing below calls ray.init()/ray.shutdown().

- ``entry()``: flagship interleaved-span extraction pipeline at tiny
  scale (synthetic corpus per BASELINE.json input_hint); returns the
  flattened output span table.
- ``queries()``: span-pipeline queries (SELF-VERIFYING: the underlying
  run raises SpanVerificationError on any span-sequence mismatch vs
  the generator oracle, so their rows-only driver check is backed by a
  hard in-path gate) + training-data analytics queries (dedup /
  similarity / clustering / joins / windows / sketches), the
  SQL-expressible ones matched column-for-column by ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from ocr_service_ray.pipeline import entry_api

    return entry_api.entry()


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_service_ray.pipeline import entry_api

    return entry_api.queries()


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """The driver calls this with no args at sf=0.01; passing an sf_dir
    resolves the span-family generator-truth parquets for that scale."""
    from ocr_service_ray.pipeline import entry_api

    return entry_api.oracle_sql(sf_dir)
