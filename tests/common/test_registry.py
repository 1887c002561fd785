from mmf_tpu.common.registry import registry


def test_register_and_get_model():
    @registry.register_model("_test_dummy_model")
    class Dummy:
        pass

    assert registry.get_model_class("_test_dummy_model") is Dummy
    assert Dummy.model_name == "_test_dummy_model"
    del registry.mapping["model_name_mapping"]["_test_dummy_model"]


def test_hierarchical_state():
    registry.register("foo.bar.baz", 42)
    assert registry.get("foo.bar.baz") == 42
    assert registry.get("foo.bar") == {"baz": 42}
    assert registry.get("nope", default=7, no_warning=True) == 7


def test_all_mapping_families_exist():
    for family in [
        "trainer", "builder", "model", "metric", "loss", "pooler", "fusion",
        "optimizer", "scheduler", "processor", "encoder", "decoder",
        "transformer_backend", "transformer_head", "iteration_strategy",
        "callback",
    ]:
        key = f"{family}_name_mapping"
        assert key in registry.mapping
    assert "test_reporter_mapping" in registry.mapping
    assert "state" in registry.mapping
