"""Stage registry: the user-extension surface (SURVEY.md §2.10)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_service_ray.pipeline import registry


class TestRegistry:
    def test_builtins_registered(self):
        names = registry.list_stages()
        for expected in ("explode_extract", "ocr", "audio_features", "frame_sample"):
            assert expected in names

    def test_register_function_stage(self):
        @registry.register_stage("double_col_test")
        def double(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(0, "a", pc.multiply(batch.column("a"), 2))

        st = registry.get_stage("double_col_test")
        assert not st.is_actor

    def test_register_actor_stage(self):
        @registry.register_stage("actor_test", batch_size=8)
        class MyActor:
            def __init__(self):
                self.n = 0

            def __call__(self, batch):
                return batch

        st = registry.get_stage("actor_test")
        assert st.is_actor
        assert st.default_opts == {"batch_size": 8}

    def test_unknown_stage_raises(self):
        with pytest.raises(KeyError):
            registry.get_stage("nope_not_registered")

    @pytest.mark.usefixtures("ray_session")
    def test_build_pipeline_applies_stages(self):
        import ray.data

        @registry.register_stage("add_one_test")
        def add_one(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(
                0, "x", pc.add(batch.column("x"), 1)
            )

        ds = ray.data.from_items([{"x": i} for i in range(10)])
        out = registry.build_pipeline(ds, ["add_one_test", "add_one_test"])
        vals = sorted(r["x"] for r in out.take_all())
        assert vals == list(range(2, 12))
