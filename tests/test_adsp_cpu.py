"""Differential fuzz: framework ADSP-21xx interpreter vs. the reference
interpreter (compiled into the oracle).

Method: load an identical randomized register file + PM/DM image into both
cores, execute ONE instruction, and require the complete architectural
state (125-field register vector, all of PM and DM, and the PM($3000)
data-port traffic) to match exactly.  Covers every opcode class the
reference dispatch implements (reference: adsp2100/adsp2100.cpp:1037-1699).
"""

import ctypes as C

import numpy as np
import pytest

from dcsexplorer_tpu.emu.adsp2105 import ADSP2105

from . import oracle

STATE_LEN = ADSP2105.STATE_LEN


def _require_cpu():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")
    return oracle.OracleCpu()


class PyCpu:
    """Python core wired with the same PM($3000) port model as the shim."""

    def __init__(self):
        self.port_in = 0
        self.port_out = 0
        self.port_writes = 0
        self.cpu = ADSP2105(read_pm=self._rpm, write_pm=self._wpm)

    def _rpm(self, addr):
        return self.port_in

    def _wpm(self, addr, val):
        self.port_out = val
        self.port_writes += 1


class NatCpu:
    """Native C++ core in port-only board mode (same PM($3000) model)."""

    def __init__(self):
        from dcsexplorer_tpu.emu.native_cpu import make_native_cpu
        self.cpu = make_native_cpu()
        if self.cpu is None:
            pytest.skip("native library unavailable")
        self.port_in = 0
        self.port_out = 0
        self.port_writes = 0
        self.cpu.config_board(1, lambda: self.port_in, self._wp,
                              lambda linear: None)

    def _wp(self, v):
        self.port_out = v
        self.port_writes += 1


def _make_cpu(kind):
    return PyCpu() if kind == "py" else NatCpu()


_STATE_NAMES = (
    ["core." + n for n in ("ax0", "ax1", "ay0", "ay1", "ar", "af", "mx0",
                           "mx1", "my0", "my1", "mr", "mf", "si", "se",
                           "sb", "sr")]
    + ["alt." + n for n in ("ax0", "ax1", "ay0", "ay1", "ar", "af", "mx0",
                            "mx1", "my0", "my1", "mr", "mf", "si", "se",
                            "sb", "sr")]
    + [f"i{k}" for k in range(8)] + [f"m{k}" for k in range(8)]
    + [f"l{k}" for k in range(8)]
    + ["px", "pc", "ppc", "loop", "loop_condition", "cntr", "astat",
       "sstat", "mstat", "astat_clear", "idle"]
    + [f"loop_stack{k}" for k in range(4)]
    + [f"cntr_stack{k}" for k in range(4)]
    + [f"pc_stack{k}" for k in range(16)]
    + [f"stat_stack{k}_{j}" for k in range(4) for j in range(3)]
    + ["pc_sp", "cntr_sp", "stat_sp", "loop_sp", "flagout", "flagin",
       "fl0", "fl1", "fl2", "imask", "icntl", "ifc"]
    + [f"irq_latch{k}" for k in range(5)] + [f"irq_state{k}" for k in range(5)]
)


def _random_state(rng, pc=None):
    """A randomized-but-consistent architectural state vector."""
    v = []
    for _ in range(2):                           # core + alt banks
        regs = [int(rng.integers(0, 0x10000)) for _ in range(16)]
        regs[10] = (int(rng.integers(0, 1 << 32)) << 32) | \
            int(rng.integers(0, 1 << 32))                    # mr (full 64)
        regs[13] = (int(rng.integers(-128, 128))) & 0xFFFF   # se: int8 domain
        regs[14] = (int(rng.integers(-16, 16))) & 0xFFFF     # sb: 5-bit domain
        regs[15] = int(rng.integers(0, 1 << 32))             # sr
        v += regs
    v += [int(rng.integers(0, 0x4000)) for _ in range(8)]    # i
    v += [int(rng.integers(-0x2000, 0x2000)) & 0xFFFFFFFF for _ in range(8)]
    ls = [int(rng.choice([0, 0, 1 << int(rng.integers(0, 14)),
                          int(rng.integers(0, 0x4000))])) for _ in range(8)]
    v += ls                                                  # l
    pc = int(rng.integers(0, 0x3FF0)) if pc is None else pc
    mstat = int(rng.integers(0, 0x80))
    astat_clear = (~0x0B if (mstat & 0x04) else ~0x0F) & 0xFF
    v += [int(rng.integers(0, 256)),             # px
          pc,
          int(rng.integers(0, 0x4000)),          # ppc
          0xFFFF,                                # loop (overridden by tests)
          int(rng.integers(0, 16)),              # loop_condition
          int(rng.integers(0, 0x4000)),          # cntr
          int(rng.integers(0, 256)),             # astat
          int(rng.integers(0, 256)),             # sstat
          mstat, astat_clear,
          0]                                     # idle
    v += [int(rng.integers(0, 1 << 18)) for _ in range(4)]   # loop_stack
    v += [int(rng.integers(0, 0x4000)) for _ in range(4)]    # cntr_stack
    v += [int(rng.integers(0, 0x4000)) for _ in range(16)]   # pc_stack
    v += [int(rng.integers(0, 256)) for _ in range(12)]      # stat_stack
    v += [int(rng.integers(0, 17)),              # pc_sp
          int(rng.integers(0, 5)),               # cntr_sp
          int(rng.integers(0, 5)),               # stat_sp
          int(rng.integers(0, 5)),               # loop_sp
          int(rng.integers(0, 2)),               # flagout
          int(rng.integers(0, 2)),               # flagin
          int(rng.integers(0, 2)), int(rng.integers(0, 2)),
          int(rng.integers(0, 2)),               # fl0..2
          int(rng.integers(0, 0x40)),            # imask
          int(rng.integers(0, 0x20)),            # icntl
          0]                                     # ifc
    v += [int(rng.integers(0, 2)) for _ in range(10)]        # latches/states
    return v


def _sync_mem(ref, py, rng):
    pm = rng.integers(0, 1 << 24, size=0x4000, dtype=np.uint32)
    dm = rng.integers(0, 1 << 16, size=0x4000, dtype=np.uint16)
    ref.set_pm(pm.tolist())
    ref.set_dm(dm.tolist())
    py.cpu.pm = [int(x) for x in pm]
    py.cpu.dm = [int(x) for x in dm]
    port = int(rng.integers(0, 0x10000))
    ref.set_port(port)
    py.port_in = port


def _compare(ref, py, op, tag):
    rs = ref.get_state()
    ps = py.cpu.state_vec()
    for k in range(STATE_LEN):
        assert rs[k] == ps[k], (
            f"{tag}: op={op:06X} field {_STATE_NAMES[k]}: "
            f"ref={rs[k]:#x} py={ps[k]:#x}")
    # the reference stores raw (uint32) words in PM; only the low 24 bits
    # are architecturally observable
    rpm = np.array(ref.get_pm(), dtype=np.uint32) & 0xFFFFFF
    ppm = np.array(list(py.cpu.pm), dtype=np.uint32)
    assert np.array_equal(rpm, ppm), (
        f"{tag}: op={op:06X} PM mismatch at "
        f"{np.nonzero(rpm != ppm)[0][:4]}")
    rdm = np.array(ref.get_dm(), dtype=np.uint16)
    pdm = np.array(list(py.cpu.dm), dtype=np.uint16)
    assert np.array_equal(rdm, pdm), (
        f"{tag}: op={op:06X} DM mismatch at "
        f"{np.nonzero(rdm != pdm)[0][:4]}")


def _step_both(ref, py, st, op, tag, loop=None):
    pc = st[57]
    if loop is not None:
        st = list(st)
        st[59] = loop
    ref.set_state(st)
    py.cpu.load_state_vec(st)
    ref.set_pm([op], start=pc)
    py.cpu.pm[pc] = op
    w0 = ref.port_writes()
    ref.step(1)
    py.cpu.step()
    _compare(ref, py, op, tag)
    assert (ref.port_writes() - w0) == 0 or py.port_writes > 0


def _run_fuzz(ops_for, n_iter, seed, tag, kind="py"):
    ref = _require_cpu()
    py = _make_cpu(kind)
    rng = np.random.default_rng(seed)
    _sync_mem(ref, py, rng)
    for it in range(n_iter):
        st = _random_state(rng)
        op = ops_for(rng, st)
        # occasionally make this instruction a loop endpoint
        loop = st[57] if rng.random() < 0.1 else 0xFFFF
        _step_both(ref, py, st, op, f"{tag}[{it}]", loop=loop)


@pytest.mark.parametrize("kind", ["py", "nat"])
def test_fuzz_fully_random(kind):
    _run_fuzz(lambda rng, st: int(rng.integers(0, 1 << 24)), 1200, 11,
              "rand", kind)


@pytest.mark.parametrize("kind", ["py", "nat"])
@pytest.mark.parametrize("hi_lo,hi_hi,name", [
    (0x00, 0x20, "control"),        # NOP/TRAP/flags/stacks/DIVS/DIVQ/...
    (0x20, 0x30, "alu_mac_cond"),   # conditional ALU/MAC + reg-move forms
    (0x30, 0x50, "immediates"),
    (0x50, 0x80, "alu_mac_mem"),    # ALU/MAC with pgm/data memory access
    (0x80, 0xA0, "direct_mem"),
    (0xA0, 0xC0, "imm_dm_write"),
    (0xC0, 0x100, "dual_ops"),
    (0x0E, 0x14, "shifts"),
])
def test_fuzz_class(hi_lo, hi_hi, name, kind):
    def gen(rng, st):
        hi = int(rng.integers(hi_lo, hi_hi))
        return (hi << 16) | int(rng.integers(0, 1 << 16))
    _run_fuzz(gen, 400, hash(name) % (1 << 31), name, kind)


@pytest.mark.parametrize("kind", ["py", "nat"])
def test_do_until_counter_loop(kind):
    """Multi-step lockstep: a DO UNTIL CE loop body executed to completion."""
    ref = _require_cpu()
    py = _make_cpu(kind)
    rng = np.random.default_rng(99)
    _sync_mem(ref, py, rng)
    st = _random_state(rng, pc=0x100)
    st[61] = 5                      # cntr
    st[103] = 0                     # pc_sp
    st[106] = 0                     # loop_sp
    st[62] = 0                      # astat
    prog = [
        0x3C000F | (5 << 4),        # grp3 reg15? use imm load cntr instead
    ]
    # program: load cntr=5; do until ce { ar = ar + 1 }; trap
    prog = [
        (0x3C << 16) | (5 << 4) | 13,      # reg load grp3 reg13 (OWRCNTR)=5
        (0x14 << 16) | ((0x103 << 4) | 14),  # DO $103 UNTIL CE
        (0x22 << 16) | (0x1 << 13) | (0x0 << 11) | (0x2 << 8) | 15,  # ar=ar+1
        0x000000,                           # NOP (loop end)
        0x010000,                           # TRAP
    ]
    ref.set_state(st)
    py.cpu.load_state_vec(st)
    ref.set_pm(prog, start=0x100)
    for k, w in enumerate(prog):
        py.cpu.pm[0x100 + k] = w
    for step in range(64):
        ref.step(1)
        alive = py.cpu.step()
        _compare(ref, py, 0, f"loop step {step}")
        if not alive:
            break
    assert not alive                # reached TRAP
    assert py.cpu.pc == 0x105


@pytest.mark.parametrize("kind", ["py", "nat"])
def test_invoke_irq_roundtrip(kind):
    """Host-invoked IRQ2: vector in, run ISR to RTI, return to host."""
    ref = _require_cpu()
    py = _make_cpu(kind)
    rng = np.random.default_rng(7)
    _sync_mem(ref, py, rng)
    st = _random_state(rng, pc=0x200)
    st[103] = 0                     # pc_sp
    st[105] = 0                     # stat_sp
    st[112] = 0x20                  # imask: IRQ2 enabled
    st[113] = 0x00                  # icntl: level-sensitive, no nesting
    st[115:125] = [0] * 10
    isr = [
        (0x40 << 16) | (0x1234 << 4) | 10,   # AR = $1234
        (0x0A << 16) | 0x1F,                 # RTI (pop status, always)
    ]
    ref.set_state(st)
    py.cpu.load_state_vec(st)
    ref.set_pm(isr, start=0x0004)
    for k, w in enumerate(isr):
        py.cpu.pm[4 + k] = w
    ref.invoke_irq(2, 0, 1000)
    py.cpu.invoke_irq(2, 0, 1000)
    _compare(ref, py, 0, "irq")
    assert py.cpu.core.ar == 0x1234
    assert py.cpu.pc == 0xFFFF      # returned to host marker
