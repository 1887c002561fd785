"""Registered host-side decoding strategies (reference utils/text.py:
220-448). BUTD decodes in-jit now, but the registry surface remains part
of the public API (plugin models can drive these directly)."""

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.text import BeamSearch, NucleusSampling


class _Vocab:
    SOS_INDEX, EOS_INDEX = 1, 2

    def get_size(self):
        return 5


def test_decoders_registered():
    assert registry.get_decoder_class("beam_search") is BeamSearch
    assert registry.get_decoder_class("nucleus_sampling") is NucleusSampling


def test_beam_search_log_softmax_and_topk():
    bs = BeamSearch(_Vocab(), {"inference": {"params": {"beam_length": 2}}})
    bs.init_batch(None)
    logits = np.tile(np.array([[0.0, 0.0, 0.0, 5.0, 1.0]], np.float32),
                     (2, 1))
    bs.decode(0, None, logits)
    # raw logits in: top words 3 then 4, scores are log-probs (negative)
    assert bs.seqs[0, -1] == 3 and bs.seqs[1, -1] == 4
    assert (bs.top_k_scores < 0).all()
    # second step: beam completing with EOS moves to complete_seqs
    step2 = np.tile(np.array([[0.0, 0.0, 9.0, 0.0, 0.0]], np.float32),
                    (2, 1))
    finished, _, keep = bs.decode(1, None, step2)
    assert len(bs.complete_seqs) >= 1
    assert finished == (len(keep) == 0)


def test_nucleus_sampling_respects_threshold():
    ns = NucleusSampling(_Vocab(),
                         {"inference": {"params": {"sum_threshold": 0.5}}})
    ns.init_batch(None)
    # one token has prob ~0.95: top-p(0.5) set is exactly that token
    logits = np.log(np.array([[0.01, 0.01, 0.01, 0.95, 0.02]], np.float64))
    finished, _, _ = ns.decode(0, None, logits)
    assert ns.seq == [3]
