"""MMBTGridHMInterface.classify end-to-end on a synthetic image
(reference tests/models/interfaces/test_interfaces.py pattern, without the
zoo download)."""

import numpy as np
import pytest
from PIL import Image

from mmf_tpu.config import omega
from mmf_tpu.models.interfaces.mmbt import MMBTGridHMInterface
from mmf_tpu.utils.env import setup_imports


@pytest.fixture(scope="module", autouse=True)
def _imports():
    setup_imports()


def _interface_config():
    return omega.create(
        {
            "dataset_config": {
                "hateful_memes": {
                    "data_dir": "tests/data",
                    "processors": {
                        "text_processor": {
                            "type": "bert_tokenizer",
                            "params": {
                                "max_seq_length": 14,
                                "tokenizer_config": {
                                    "type": "bert-base-uncased",
                                    "vocab_file": "tests/data/vocab.txt",
                                },
                            },
                        },
                        "image_processor": {
                            "type": "torchvision_transforms",
                            "params": {
                                "transforms": [
                                    {"type": "Resize", "params": {"size": [32, 32]}},
                                    {"type": "CenterCrop", "params": {"size": [32, 32]}},
                                    "ToTensor",
                                    "GrayScaleTo3Channels",
                                ]
                            },
                        },
                    },
                }
            }
        }
    )


def test_mmbt_hm_interface_classify():
    from mmf_tpu.common.registry import registry

    mmbt_cls = registry.get_model_class("mmbt")
    model = mmbt_cls.from_params(
        training_head_type="classification",
        num_labels=2,
        modal_hidden_size=64,
        text_hidden_size=64,
        text_encoder={
            "type": "transformer",
            "params": {
                "hidden_size": 64,
                "num_hidden_layers": 1,
                "num_attention_heads": 2,
                "vocab_size": 100,
            },
        },
        modal_encoder={
            "type": "resnet152",
            "params": {"pretrained": False, "pool_type": "avg",
                       "num_output_features": 1},
        },
    )
    iface = MMBTGridHMInterface(model, _interface_config())
    image = Image.fromarray(
        np.random.randint(0, 255, (48, 48, 3), dtype=np.uint8)
    )
    out = iface.classify(image, "this is a test sentence")
    assert out["label"] in (0, 1)
    assert 0.0 <= out["confidence"] <= 1.0
