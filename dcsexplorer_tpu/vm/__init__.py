"""Track byte-code VM — facade.

The VM implementation lives inside the runtime decoder
(refdec/decoder.py `_exec_track`, `irq2_handler`, the command queue and the
boot state machine) because it shares the per-channel state with stream
playback, exactly as in the reference (DCSDecoderNative.cpp:848-1228).
This package re-exports the pieces tooling normally wants:

- ``ReferenceDecoder`` — the full runtime (VM + decode).
- ``ControlTracer`` — the VM alone, numerics stubbed, recording per-frame
  control vectors for the device pipeline.
- ``tracks`` — static analysis: decompiler, explainer, loop-aware timing.
"""

from ..models.pipeline import ControlTracer
from ..refdec.decoder import ReferenceDecoder
from ..rom import tracks

__all__ = ["ControlTracer", "ReferenceDecoder", "tracks"]
