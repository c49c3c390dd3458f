"""Track byte-code VM.

- ``ControlTracer`` (vm/tracer.py, lives HERE) — the VM alone, numerics
  stubbed, recording per-frame control vectors for the device pipeline.
- ``ReferenceDecoder`` — the full runtime (VM + decode).  The byte-code
  interpreter itself (`_exec_track`, `irq2_handler`, the command queue and
  the boot state machine) lives inside refdec/decoder.py because it shares
  per-channel state with stream playback, exactly as in the reference
  (DCSDecoderNative.cpp:848-1228).
- ``tracks`` — static analysis: decompiler, explainer, loop-aware timing.
"""

from ..refdec.decoder import ReferenceDecoder
from ..rom import tracks
from .tracer import ControlTracer

__all__ = ["ControlTracer", "ReferenceDecoder", "tracks"]
