"""Decoder backend registry with prefix matching.

Counterpart of the reference's Registration/factory system
(reference: DCSDecoder.cpp:1955-1974) and the explorer's `--decoder`
selection logic (reference: DCSExplorer/DCSExplorer.cpp:458-537): backends
register under a name, and a caller selects one by exact name or unique
leading prefix (case-insensitive).

The reference registers a third backend — the emulator with the PinMame
"speedup" patches (hand-translated native IFFT inner loops,
DCSDecoderEmu.cpp:644-889).  This framework intentionally does not: the
speedup exists there only because the emulator was the reference's fast
path, while here the scalar runtime ("native") and the TPU batch pipeline
fill that role, and the emulator's purpose is strict validation — the
reference itself always validates in strict mode
(DCSExplorer.cpp:1033-1036).  A speedup-patched interpreter would also be
unverifiable in this repo, since the patch signatures only occur in the
original commercial ROM programs, which are not distributable.
"""


class Registration:
    def __init__(self, name, description, factory):
        self.name = name
        self.description = description
        self.factory = factory


_REGISTRY = {}


def register(name, description, factory):
    _REGISTRY[name] = Registration(name, description, factory)


def registrations():
    """All registered backends, sorted by name."""
    _ensure_builtin()
    return [_REGISTRY[k] for k in sorted(_REGISTRY)]


class AmbiguousBackendError(ValueError):
    pass


def resolve(prefix):
    """Find a backend by exact name or unique leading prefix.

    Raises KeyError (no match) or AmbiguousBackendError (several matches).
    """
    _ensure_builtin()
    p = prefix.lower()
    matches = []
    for name, reg in sorted(_REGISTRY.items()):
        if name.lower() == p:
            return reg
        if name.lower().startswith(p):
            matches.append(reg)
    if len(matches) == 1:
        return matches[0]
    if not matches:
        raise KeyError(prefix)
    raise AmbiguousBackendError(
        f"'{prefix}' matches {[m.name for m in matches]}")


def create(prefix, host=None):
    """Instantiate the backend selected by name/prefix."""
    return resolve(prefix).factory(host)


def _ensure_builtin():
    if "native" in _REGISTRY:
        return
    from ..emu.board import EmulatedDecoder
    from .decoder import ReferenceDecoder
    register("native", "bit-exact scalar decoder (runtime reference)",
             lambda host=None: ReferenceDecoder(host))
    register("emulator-strict",
             "ADSP-2105 interpreter running original ROM firmware",
             lambda host=None: EmulatedDecoder(host))
