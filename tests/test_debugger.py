"""ADSP debugger + backend registry tests."""

import pytest

from dcsexplorer_tpu.emu.adsp2105 import ADSP2105
from dcsexplorer_tpu.emu.debugger import Debugger
from dcsexplorer_tpu.refdec import registry


def _program():
    cpu = ADSP2105()
    cpu.reset()
    prog = [
        (0x3C << 16) | (4 << 4) | 13,        # 0: CNTR = 4 (OWRCNTR)
        (0x14 << 16) | (0x002 << 4) | 14,    # 1: DO $002 UNTIL CE
        0x000000,                            # 2: NOP (loop body/end)
        (0x1C << 16) | (0x006 << 4) | 0xF,   # 3: CALL $0006
        0x010000,                            # 4: TRAP
        0x000000,                            # 5
        (0x40 << 16) | (0x77 << 4) | 10,     # 6: AR = $0077
        (0x0A << 16) | 0x0F,                 # 7: RTS
    ]
    for k, w in enumerate(prog):
        cpu.pm[k] = w
    return cpu


def test_step_and_regs():
    dbg = Debugger(_program())
    dbg.step(1)
    assert dbg.cpu.pc == 1
    assert "PC=0001" in dbg.regs()
    assert "CNTR=0004" in dbg.regs()


def test_step_over_loop_and_call():
    dbg = Debugger(_program())
    dbg.step(1)                      # past CNTR load
    n, why = dbg.step_over()         # entire DO UNTIL loop
    assert why == "step-over" and dbg.cpu.pc == 3
    n, why = dbg.step_over()         # entire CALL
    assert why == "step-over" and dbg.cpu.pc == 4
    assert dbg.cpu.core.ar == 0x77


def test_breakpoint_and_cont():
    dbg = Debugger(_program())
    dbg.set_bp(6)
    n, why = dbg.cont()
    assert why == "breakpoint" and dbg.cpu.pc == 6
    n, why = dbg.cont()
    assert why == "trap"
    dbg.clear_bp()
    assert not dbg.breakpoints


def test_disasm_and_dumps():
    dbg = Debugger(_program())
    listing = dbg.disasm(0, count=3)
    assert "CNTR" in listing and "DO" in listing
    assert "*" in listing            # PC marker on the first line
    dbg.cpu.dm[0x100] = 0xBEEF
    assert "BEEF" in dbg.dump_dm(0x100, 8)
    assert "010000" in dbg.dump_pm(4, 1)


def test_repl_smoke():
    dbg = Debugger(_program())
    cmds = iter(["s", "r", "b 6", "g", "u 0", "dm 0 8", "bl", "q"])
    out = []
    dbg.repl(input_fn=lambda _: next(cmds), print_fn=out.append)
    text = "\n".join(out)
    assert "breakpoint" in text and "PC=" in text


def test_registry_prefix_matching():
    regs = registry.registrations()
    names = [r.name for r in regs]
    assert "native" in names and "emulator-strict" in names
    assert "emulator-fast" in names
    assert registry.resolve("nat").name == "native"
    assert registry.resolve("EMULATOR-STRICT").name == "emulator-strict"
    assert registry.resolve("emulator-s").name == "emulator-strict"
    assert registry.resolve("emulator-f").name == "emulator-fast"
    with pytest.raises(KeyError):
        registry.resolve("gpu")
    with pytest.raises(registry.AmbiguousBackendError):
        registry.resolve("e")           # strict vs fast
    dec = registry.create("nat")
    assert type(dec).__name__ == "ReferenceDecoder"
    dec2 = registry.create("emulator-st")
    assert type(dec2).__name__ == "EmulatedDecoder"


def test_registry_ambiguity():
    registry.register("native-x", "test entry", lambda host=None: None)
    try:
        with pytest.raises(registry.AmbiguousBackendError):
            registry.resolve("nativ")
        # exact match wins even when it prefixes others
        assert registry.resolve("native").name == "native"
    finally:
        registry._REGISTRY.pop("native-x", None)
