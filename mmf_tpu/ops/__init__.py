from mmf_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
    flash_attention,
    make_attention_bias,
    combine_biases,
    mha_reference,
)
