#!/usr/bin/env python
"""Regenerate the committed FLAC byte-pin fixture.

Writes two byte-pin fixtures asserted byte-identical to fresh encodes
by ``tests/test_flac.py`` (any drift in the bit format fails loudly):

* ``tests/fixtures/flac/doc0370.flac`` — the mono stream the
  ``multimodal_flac_energy`` query encodes for doc_id 370 (all four
  subframe types, partition order 1, 5-bit Rice method, wasted bits);
* ``tests/fixtures/flac/doc0410_stereo.flac`` — the stereo stream the
  ``multimodal_flac_stereo_energy`` query encodes for doc_id 410 (all
  four channel assignments incl. the 17-bit side subframes).

Deterministic: no RNG, no timestamps.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstore_fdw_spark.operators.flac_codec import flac_decode, flac_encode  # noqa: E402
from cstore_fdw_spark.operators.multimodal import (  # noqa: E402
    _flac_plan, _flac_signal, _flac_stereo_plan, _flac_stereo_signal)

DOC_ID = 370
STEREO_DOC_ID = 410


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "tests", "fixtures", "flac")
    os.makedirs(out_dir, exist_ok=True)
    samples = _flac_signal(DOC_ID, 200 + (DOC_ID % 57))
    payload = flac_encode(samples, plan=_flac_plan)
    assert flac_decode(payload)[2] == samples
    path = os.path.join(out_dir, f"doc{DOC_ID:04d}.flac")
    with open(path, "wb") as f:
        f.write(payload)
    print(f"{path}: {len(payload)} bytes for {len(samples)} samples")

    lr = _flac_stereo_signal(STEREO_DOC_ID, 180 + (STEREO_DOC_ID % 77))
    payload = flac_encode(lr, plan=_flac_stereo_plan)
    assert flac_decode(payload)[2] == lr
    path = os.path.join(out_dir, f"doc{STEREO_DOC_ID:04d}_stereo.flac")
    with open(path, "wb") as f:
        f.write(payload)
    print(f"{path}: {len(payload)} bytes for {len(lr[0])} stereo samples")


if __name__ == "__main__":
    main()
