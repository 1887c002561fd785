from mmf_tpu.models.transformers.backends import huggingface  # noqa: F401
