from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver contract)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic tiny corpus (2 parts x 8 docs) shared by e2e tests."""
    from ocr_service_ray.fixtures.gen import generate_scale

    root = str(tmp_path_factory.mktemp("corpus_tiny"))
    info = generate_scale(root, "tiny", seed=42)
    return info
