"""Synthesized boot firmware for generated ROMs.

Original DCS ROMs carry the real ADSP-2105 decoder program; compiled ROM
sets from this framework can't include that (it isn't redistributable), but
they can carry a minimal, runnable firmware so the emulator backend
(emu/board.py) boots them: vectors, SPORT1 autobuffer setup, the
autobuffer-sync wait loop and main-loop shapes the emulator's patch-point
search expects (the same opcode sequences all real DCS programs share),
the master-volume routine signature, and an IRQ2 handler that services the
data port.  Each main-loop pass emits one frame of silence — the synthetic
firmware boots and runs everywhere, but real decoding still needs original
firmware, exactly as with the reference's emulator.
"""

NOP = 0x000000
RTI = 0x0A001F
RTS = 0x0A000F

AX0, AY0, AY1, AR, SR1 = 0, 4, 5, 10, 15
BUF = 0x1000            # autobuffer DM base
BUF_MID = BUF + 0xF0
WPTR = 0x0803           # autobuffer write-pointer variable
LAST_PORT = 0x0810      # last data-port byte received
VOL_VAR = 0x0900        # master volume variable (found by signature search)


def jump(t, cond=0xF):
    return 0x180000 | ((t & 0x3FFF) << 4) | cond


def imm_ndr(grp, reg, val):
    return ((0x30 | (grp << 2)) << 16) | ((val & 0x3FFF) << 4) | reg


def imm_dr(reg, val):
    return 0x400000 | ((val & 0xFFFF) << 4) | reg


def rd_dm(grp, reg, addr):
    return 0x800000 | (grp << 18) | ((addr & 0x3FFF) << 4) | reg


def wr_dm(grp, reg, addr):
    return 0x900000 | (grp << 18) | ((addr & 0x3FFF) << 4) | reg


def build_firmware(hw_version):
    """Mini firmware word list (entry at word 8, IRQ2 vector at word 4).

    hw_version: 2 = original DCS board (data port at PM($3000)),
    3 = DCS-95 (data port at DM($3300)).
    """
    MAIN, IRQ2 = 0x08, 0x38
    w = {}
    w[0x00] = jump(MAIN)                     # RESET vector
    w[0x04] = jump(IRQ2)                     # IRQ2 vector

    a = MAIN
    def emit(op):
        nonlocal a
        w[a] = op
        a += 1

    # autobuffer: I3=BUF, L3=480, M3=1; $3FEF control word names ireg/mreg 3
    emit(imm_ndr(1, 3, BUF))
    emit(imm_ndr(1, 11, 480))
    emit(imm_ndr(1, 7, 1))
    emit(imm_dr(AX0, 0x0002 | (3 << 9) | (3 << 7)))
    emit(wr_dm(0, AX0, 0x3FEF))
    emit(imm_ndr(3, 3, 0x20))                # IMASK: IRQ2
    emit(imm_ndr(1, 4, 1))                   # M0 = 1
    emit(imm_dr(AR, BUF))
    emit(wr_dm(0, AR, WPTR))
    if hw_version == 2:
        emit(imm_ndr(2, 1, 0x3000))          # I5 = $3000 (PM data port)
        emit(imm_ndr(2, 5, 0))               # M5 = 0
    # master-volume routine signature: 8xxxxF 2E7FEF 1yyyy0
    emit(rd_dm(0, SR1, VOL_VAR))
    emit(0x2E7FEF)
    emit(jump(a + 1, cond=0))
    TOP = a
    # main loop entry signature: 3C1025 3xxxx0 1xxxxE
    emit(0x3C1025)                           # CNTR = $0102
    emit(imm_ndr(1, 0, 0x0800))              # I0 = $0800
    emit(0x140000 | ((a + 1) << 4) | 14)     # DO . UNTIL CE
    emit(NOP)
    # fill one frame of silence at the write pointer
    emit(rd_dm(1, 0, WPTR))                  # I0 = write pointer
    emit(imm_dr(AR, 0))                      # AR = 0 (silence)
    emit(imm_ndr(3, 5, 240))                 # CNTR = 240
    emit(0x140000 | ((a + 1) << 4) | 14)     # DO . UNTIL CE
    emit(0x680000 | (AR << 4))               # DM(I0,M0) = AR (MAC no-op)
    # autobuffer sync wait loop: 0D02A3 4xxxx4 26E20F 1yyyy4
    sync = a
    emit(0x0D02A3)                           # AR = I7
    emit(imm_dr(AY0, BUF_MID))
    emit(0x26E20F)                           # AF = AR - AY0
    emit(jump(sync, cond=4))                 # IF LT JUMP sync
    emit(imm_dr(AR, BUF))                    # 4xxxxA (write-pointer resets)
    emit(wr_dm(0, AR, WPTR))                 # 9zzzzA
    emit(imm_dr(AR, BUF_MID))                # 4yyyyA
    emit(wr_dm(0, AR, WPTR))                 # 9zzzzA
    emit(jump(TOP))                          # main loop jump (gets trapped)

    a = IRQ2
    if hw_version == 2:
        # MAC(no-op) with pgm memory read via DAG2 (I5/M5) pops the port
        emit(0x500000 | (AX0 << 4) | 0x05)
    else:
        emit(rd_dm(0, AX0, 0x3300))
    emit(wr_dm(0, AX0, LAST_PORT))
    emit(RTI)

    n = max(w) + 1
    return [w.get(k, NOP) for k in range(n)]


def encode_boot_block(words):
    """Words → 4-byte ROM groups with the auto-boot length in byte 3 of the
    first group (8*(b3+1) words loaded)."""
    n = (len(words) + 7) // 8 * 8
    words = words + [NOP] * (n - len(words))
    out = bytearray()
    for k, word in enumerate(words):
        out += bytes([(word >> 16) & 0xFF, (word >> 8) & 0xFF,
                      word & 0xFF, n // 8 - 1 if k == 0 else 0xFF])
    return bytes(out)
