"""Emulated-board decoder tests.

Real DCS firmware isn't redistributable, so these tests hand-assemble a
miniature ADSP-2105 "firmware" that reproduces the structural properties
the board virtualization keys on — the soft-boot block format, the
autobuffer-sync wait loop, the main-loop entry signature, the master-volume
routine signature, the IRQ2 vector, and the SPORT1 autobuffer setup — and
verify the full boot → patch → run → sample-harvest → data-port pipeline
(reference behavior: DCSDecoderEmu.cpp:101-395).
"""

import pytest

from dcsexplorer_tpu.emu import board as eb
from dcsexplorer_tpu.emu.board import EmulatedDecoder
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom.image import RomSet

NOP = 0x000000
RTI = 0x0A001F


def jump(target, cond=0xF):
    return 0x180000 | (target << 4) | cond


def do_until_ce(end):
    return 0x140000 | (end << 4) | 14


def imm_ndr(grp, reg, val):
    """Load non-data register immediate (14-bit value)."""
    return ((0x30 | (grp << 2)) << 16) | ((val & 0x3FFF) << 4) | reg


def imm_dr(reg, val):
    """Load data register immediate (16-bit value)."""
    return 0x400000 | ((val & 0xFFFF) << 4) | reg


def rd_dm(grp, reg, addr):
    return 0x800000 | (grp << 18) | (addr << 4) | reg


def wr_dm(grp, reg, addr):
    return 0x900000 | (grp << 18) | (addr << 4) | reg


def alu_ar(sel, xsel, ysel, cond=0xF):
    return 0x220000 | (sel << 13) | (ysel << 11) | (xsel << 8) | cond


def reg_move(dgrp, dreg, sgrp, sreg):
    return 0x0D0000 | (dgrp << 10) | (sgrp << 8) | (dreg << 4) | sreg


# register indices (group 0)
AX0, AY0, AY1, AR, SR1 = 0, 4, 5, 10, 15
BUF = 0x1000            # autobuffer DM base
BUF_MID = BUF + 0xF0
WPTR = 0x0803           # write-pointer variable
FRAME_NO = 0x0802       # frame counter variable
VOL_VAR = 0x0900        # master volume variable
PORT_ECHO = 0x0810      # last data-port byte received by firmware


def build_firmware():
    """Mini DCS-95 firmware: each main-loop pass fills the lower autobuffer
    half with the (1-based) frame number; IRQ2 stores the incoming port byte
    and echoes byte+1 back to the host."""
    MAIN, IRQ2, TOP = 0x08, 0x30, None
    w = {}
    w[0x00] = jump(MAIN)                     # RESET vector
    w[0x04] = jump(IRQ2)                     # IRQ2 vector

    a = MAIN
    def emit(op):
        nonlocal a
        w[a] = op
        a += 1

    # autobuffer: I3=BUF, L3=480, M3=1; control word names ireg=3, mreg=3
    emit(imm_ndr(1, 3, BUF))                 # I3
    emit(imm_ndr(1, 11, 480))                # L3
    emit(imm_ndr(1, 7, 1))                   # M3
    emit(imm_dr(AX0, 0x0002 | (3 << 9) | (3 << 7)))
    emit(wr_dm(0, AX0, 0x3FEF))              # enable autobuffer
    emit(imm_ndr(3, 3, 0x20))                # IMASK: IRQ2
    emit(imm_ndr(1, 4, 1))                   # M0 = 1
    emit(imm_dr(AR, BUF))
    emit(wr_dm(0, AR, WPTR))                 # init write pointer
    # master-volume routine signature: 8xxxxF 2E7FEF 1yyyy0
    emit(rd_dm(0, SR1, VOL_VAR))
    emit(0x2E7FEF)
    emit(jump(a + 1, cond=0))                # IF EQ JUMP next
    TOP = a
    # main loop entry signature: 3C1025 3xxxx0 1xxxxE
    emit(0x3C1025)                           # CNTR = $0102
    emit(imm_ndr(1, 0, 0x0800))              # I0 = $0800
    emit(do_until_ce(a + 1))                 # DO . UNTIL CE
    emit(NOP)                                # (loop body)
    # fill one frame: 240 words of (frame number + 1) at DM(WPTR)
    emit(rd_dm(1, 0, WPTR))                  # I0 = write pointer
    emit(rd_dm(0, AY1, FRAME_NO))
    emit(alu_ar(1, 0, 1))                    # AR = AY1 + 1
    emit(wr_dm(0, AR, FRAME_NO))
    emit(imm_ndr(3, 5, 240))                 # CNTR = 240
    emit(do_until_ce(a + 1))
    emit(0x680000 | (AR << 4))               # DM(I0,M0) = AR (MAC no-op)
    # autobuffer sync wait loop: 0D02A3 4xxxx4 26E20F 1yyyy4
    sync = a
    emit(reg_move(0, AR, 2, 3))              # AR = I7 (0D02A3)
    emit(imm_dr(AY0, BUF_MID))
    emit(0x26E20F)                           # AF = AR - AY0
    emit(jump(sync, cond=4))                 # IF LT JUMP sync
    emit(imm_dr(AR, BUF))                    # 4xxxxA \ first pointer reset
    emit(wr_dm(0, AR, WPTR))                 # 9zzzzA /
    emit(imm_dr(AR, BUF_MID))                # 4yyyyA \ second pointer reset
    emit(wr_dm(0, AR, WPTR))                 # 9zzzzA /
    emit(jump(TOP))                          # main loop jump (gets trapped)

    a = IRQ2
    emit(rd_dm(0, AX0, 0x3300))              # read data port
    emit(wr_dm(0, AX0, PORT_ECHO))
    emit(alu_ar(3, 0, 3))                    # AR = AX0 + 0  (X+Y, Y=zero)
    emit(wr_dm(0, AR, 0x3300))               # echo to host
    emit(RTI)

    n = max(w) + 1
    return [w.get(k, NOP) for k in range(n)]


def build_u2(words):
    u2 = bytearray(0x10000)
    # pad the boot block to a multiple of 8 words and record its length
    # in the 4th byte of the first 4-byte group
    n = (len(words) + 7) // 8 * 8
    words = words + [NOP] * (n - len(words))
    base = 0x1000
    for i, word in enumerate(words):
        u2[base + i * 4] = (word >> 16) & 0xFF
        u2[base + i * 4 + 1] = (word >> 8) & 0xFF
        u2[base + i * 4 + 2] = word & 0xFF
    u2[base + 3] = n // 8 - 1
    return bytes(u2)


def make_decoder(hw_version=eb.HW_DCS95):
    words = build_firmware()
    rs = RomSet()
    rs.add_rom(2, build_u2(words))
    rs.hw_version = hw_version
    rs.os_version = rd.OS95 if hw_version == eb.HW_DCS95 else rd.OS94
    rs.nominal_version = 0x0105
    dec = EmulatedDecoder()
    dec.load_rom_set(rs)
    dec.default_volume = 200
    return dec


def test_boot_and_patch():
    dec = make_decoder()
    dec.soft_boot()
    assert dec.state == rd.ST_RUNNING, dec.error_message
    # the master volume variable was located and poked with the default
    assert dec.master_volume_addr == VOL_VAR
    assert dec.cpu.dm[VOL_VAR] == 200
    dec.set_master_volume(90)
    assert dec.cpu.dm[VOL_VAR] == 90
    # the autobuffer registers were captured from the $3FEF write
    assert dec.autobuffer.base == BUF
    assert dec.autobuffer.length == 480
    assert dec.autobuffer.step == 1


def test_frames_from_autobuffer():
    dec = make_decoder()
    dec.soft_boot()
    samples = dec.next_samples(480)
    assert samples[:240] == [1] * 240      # pass 1 fills frame value 1
    assert samples[240:] == [2] * 240      # pass 2
    assert dec.cpu.dm[WPTR] == BUF         # patched sync reset the pointer


def test_irq2_data_port():
    dec = make_decoder()
    dec.soft_boot()
    dec.next_samples(240)
    dec.write_data_port(0x42)
    samples = dec.next_samples(240)
    # the firmware's own IRQ2 handler consumed the byte
    assert dec.cpu.dm[PORT_ECHO] == 0x42
    # and echoed a byte back through the DM($3300) port to the host
    assert len(dec.host.rx) >= 1
    assert samples == [2] * 240


def test_incompatible_rom_fails_cleanly():
    words = build_firmware()
    # corrupt the main-loop entry signature
    words[words.index(0x3C1025)] = NOP
    rs = RomSet()
    rs.add_rom(2, build_u2(words))
    rs.hw_version = eb.HW_DCS95
    rs.os_version = rd.OS95
    dec = EmulatedDecoder()
    dec.load_rom_set(rs)
    dec.soft_boot()
    assert dec.state == rd.ST_INIT_ERROR
    assert "not compatible" in dec.error_message


def test_dcs93_board_map():
    """Unit-level checks of the original-board memory map: PM($3000) data
    port, DM($3000) bank select with the DM($2000) ROM window, and the
    system-control soft reset."""
    dec = make_decoder(hw_version=eb.HW_DCS93)
    rs = dec.rom_set
    # bank select maps (data << 12) into the DM($2000..$2FFF) window
    dec._write_dm(0x3000, 0x0003)
    assert dec._read_dm(0x2005) == rs.chips[0][0x3005]
    # PM($3000) read pops the host->decoder queue on the original boards
    dec.data_port_queue.append(0x5A)
    assert dec._read_pm_port(0x3000) == 0x5A
    # PM($3000) write sends to the host
    dec._write_pm_port(0x3000, 0x1234)
    assert dec.host.rx[-1] == 0x34
    # system control register bit $0200 soft-boots
    with pytest.raises(rd.ResetError):
        dec._write_dm(0x3FFF, 0x0200)


def test_dcs95_rom_window():
    dec = make_decoder()
    rs = dec.rom_set
    # DCS-95: chip select in $3100 bits 2-4, offset bits in $3100/$3000
    dec._write_dm(0x3100, 0x0000)
    dec._write_dm(0x3000, 0x0004)        # offset $2000 within U2
    assert dec._read_dm(0x0001) == rs.chips[0][0x2001]


def test_compiler_roms_boot_in_emulator():
    """ROM sets produced by the compiler carry a runnable mini-firmware:
    the emulator backend boots them, runs main-loop passes (silence), and
    services data-port bytes via the firmware's IRQ2 handler."""
    from dcsexplorer_tpu.compiler import romgen
    from dcsexplorer_tpu.rom import zipload
    from .test_romgen import _make_spec      # the shared synthetic ROM spec

    spec = _make_spec()
    zip_bytes = romgen.RomBuilder(spec).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes)
    assert rs.check() == 1

    dec = EmulatedDecoder()
    dec.load_rom_set(rs)
    dec.default_volume = 200
    dec.soft_boot()
    assert dec.state == rd.ST_RUNNING, dec.error_message
    out = dec.next_samples(480)
    assert out == [0] * 480                 # silence until a track plays
    dec.write_data_port(0x37)
    dec.next_samples(240)
    # the decoding firmware's IRQ2 latched the byte as a command-word high
    from dcsexplorer_tpu.compiler.firmware94 import SYM
    assert dec.cpu.dm[SYM["DPW"]] == 0x3700
    assert dec.cpu.dm[SYM["NDP"]] == 1
    # the master-volume variable was located by signature
    assert dec.master_volume_addr == SYM["VOL_NOM"]


def _compiled_emulated():
    from dcsexplorer_tpu.compiler import romgen
    from dcsexplorer_tpu.rom import zipload
    from .test_romgen import _make_spec
    spec = _make_spec()
    rs, _ = zipload.load_zip_data(romgen.RomBuilder(spec).build_zip())
    dec = EmulatedDecoder()
    dec.load_rom_set(rs)
    dec.default_volume = 200
    dec.soft_boot()
    assert dec.state == rd.ST_RUNNING, dec.error_message
    return dec


def test_firmware_data_port_protocol():
    """The synthesized firmware's IRQ2 handler implements the real
    byte-at-a-time protocol: $55AA volume with ~complement check, $55C2/C3
    version queries answered on the port, track commands latched."""
    from dcsexplorer_tpu.compiler.firmware94 import CMDQ, SYM
    dec = _compiled_emulated()
    # master volume command: 55 AA 50 AF
    for b in (0x55, 0xAA, 0x50, 0xAF):
        dec.write_data_port(b)
    dec.next_samples(240)
    assert dec.cpu.dm[SYM["VOL_NOM"]] == 0x50
    # a bad complement must NOT update the volume
    for b in (0x55, 0xAA, 0x71, 0x00):
        dec.write_data_port(b)
    dec.next_samples(240)
    assert dec.cpu.dm[SYM["VOL_NOM"]] == 0x50
    # version queries reply on the data port
    dec.host.rx.clear()
    for b in (0x55, 0xC2, 0x55, 0xC3):
        dec.write_data_port(b)
    dec.next_samples(240)
    assert dec.host.rx == [0x01, 0x06]
    # a plain track command goes through the command ring
    for b in (0x12, 0x34):
        dec.write_data_port(b)
    dec.next_samples(240)
    assert dec.cpu.dm[CMDQ] == 0x1234
    assert dec.cpu.dm[SYM["CQT"]] == 1
