"""Re-verify the committed format tables against the reference source.

``format/tables_data.npz`` is the one reference-derived artifact in the repo:
the DCS format's constant tables (Huffman codebooks, band-translation tables,
IFFT twiddles, bit-reversal permutation, overlap window, scale factors),
extracted from the reference implementation by
``format/extract_tables.py``.  This test re-runs the extraction when the
read-only reference tree is present and asserts the committed file matches
exactly — so a transcription error (or a stale npz after an extractor
change) can never slip through CI.
"""

import os

import numpy as np
import pytest

from dcsexplorer_tpu.format import extract_tables

REF_ROOT = "/root/reference"
NPZ = os.path.join(os.path.dirname(extract_tables.__file__), "tables_data.npz")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, extract_tables.REF_NATIVE)),
    reason="reference tree not available")
def test_committed_tables_match_reference():
    fresh = extract_tables.extract(REF_ROOT)
    committed = np.load(NPZ)

    assert sorted(fresh.keys()) == sorted(committed.files), (
        "table set changed: extractor and committed npz disagree on keys")
    for key in fresh:
        a, b = fresh[key], committed[key]
        assert a.shape == b.shape, f"{key}: shape {a.shape} != {b.shape}"
        assert np.array_equal(a, b), f"{key}: values diverge from reference"


def test_tables_load_and_have_expected_shapes():
    """Sanity that runs even without the reference tree."""
    t = np.load(NPZ)
    expect = {
        "overlap_coeff": (16,), "bitrev9": (512,), "ifft_coeff": (256,),
        "preadj0": (16,), "preadj3": (16,),
        "xlat02": (16, 2), "xlat35": (16, 2), "xlat6f": (16, 2),
        "band_output_count": (16,), "max_bit_width": (7,),
        "scale_mantissa": (4,),
        "os93a_pair_table": (2048,), "os93a_inputs_per_band": (18,),
        "os93a_band_bits_codebooks": (64, 2), "os93a_scale_codebook": (80, 3),
    }
    for key, shape in expect.items():
        assert t[key].shape == shape, f"{key}: {t[key].shape} != {shape}"
    for i, size in ((1, 4), (2, 8), (3, 32), (4, 128), (5, 256), (6, 512)):
        assert t[f"codebook{i}"].shape == (size,)
