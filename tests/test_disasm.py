"""ADSP-21xx disassembler: fuzz parity vs the reference's disassembler."""

import ctypes as C

import numpy as np
import pytest

from dcsexplorer_tpu.rom.disasm import disassemble, disassemble_rom

from . import oracle


def test_disassembler_matches_reference():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")
    lib = C.CDLL(oracle._build.LIB)
    lib.dcsref_dasm.argtypes = [C.c_uint, C.c_char_p, C.c_int]
    buf = C.create_string_buffer(512)

    def norm(s):
        return s.replace("$", "").replace(" ", "").lower()

    rng = np.random.default_rng(123)
    ops = list(rng.integers(0, 1 << 24, size=30000))
    for hi in range(256):
        ops.append((hi << 16) | int(rng.integers(0, 1 << 16)))
    for op in ops:
        op = int(op)
        lib.dcsref_dasm(op, buf, 512)
        ref = buf.value.decode()
        mine = disassemble(op).text
        if ref in ("?", ""):
            continue
        if "???" in ref or "???" in mine:
            assert ("???" in ref) == ("???" in mine), f"op {op:06X}"
        else:
            assert norm(ref) == norm(mine), (
                f"op {op:06X}: ref={ref!r} mine={mine!r}")


def test_disassemble_rom_formatting():
    # JUMP at the reset vector + FF fill collapse
    data = bytes([0x18, 0x12, 0x3F, 0xFF]) + b"\xff" * 32
    lines = disassemble_rom(data, start_addr=0)
    assert "RESET vector" in lines[0]
    assert "JUMP $0123" in lines[0]
    assert "FF fill" in lines[1]


def test_branch_targets():
    i = disassemble(0x1C123F)    # CALL
    assert i.kind == "call" and i.target == 0x0123
    i = disassemble(0x14005F)    # DO UNTIL FOREVER
    assert i.kind == "do" and i.text.endswith("FOREVER")
