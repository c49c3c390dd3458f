"""Static-trace disassembly tests: vector patching, overlay reconstruction,
jump-table heuristics, reachability, data regions."""

from dcsexplorer_tpu.rom import dasmtrace

NOP = 0x000000
TRAP = 0x010000
RTI = 0x0A001F


def jump(t, cond=0xF):
    return 0x180000 | (t << 4) | cond


def call(t):
    return 0x1C0000 | (t << 4) | 0xF


def imm_ax0(v):
    return 0x400000 | (v << 4) | 0


def imm_si(v):
    return 0x400000 | (v << 4) | 8


def imm_i0(v):
    return 0x340000 | (v << 4) | 0


def imm_i4(v):
    return 0x380000 | (v << 4) | 0


def pack_words(words, u2, ofs):
    for k, w in enumerate(words):
        u2[ofs + k * 4] = (w >> 16) & 0xFF
        u2[ofs + k * 4 + 1] = (w >> 8) & 0xFF
        u2[ofs + k * 4 + 2] = w & 0xFF


def boot_block(words, u2, ofs):
    n = (len(words) + 7) // 8 * 8
    pack_words(words + [NOP] * (n - len(words)), u2, ofs)
    u2[ofs + 3] = n // 8 - 1


def test_hard_boot_vector_patch():
    u2 = bytearray(0x8000)
    w = {0: jump(0x40)}
    # signature padding words 1..0x18, then the vector patch table at 0x20
    for k in range(0x20, 0x23):
        w[k] = jump(0x50 + (k - 0x20))
    w[0x23] = RTI
    w[0x40] = TRAP
    for a in (0x50, 0x51, 0x52):
        w[a] = RTI
    words = [w.get(k, NOP) for k in range(0x48 + 8)]
    boot_block(words, u2, 0)
    prog = dasmtrace.reconstruct(bytes(u2), 0)
    # the four vector slots got the patch-table entries
    assert prog.code[0x0004] == jump(0x50)
    assert prog.code[0x0008] == jump(0x51)
    assert prog.code[0x000C] == jump(0x52)
    assert prog.code[0x0010] == RTI
    lines = dasmtrace.disassemble_program(bytes(u2), 0)
    text = "\n".join(lines)
    assert "RESET vector" in text and "IRQ2 vector" in text
    assert "patched by boot loader" in text


def _soft_boot_u2():
    """U2 with a soft-boot program at $1000 that loads one init overlay and
    one resident overlay via the standard loader template, plus a jump
    table dispatched through JUMP (I4)."""
    u2 = bytearray(0x40000)
    INIT_OV_ROM, MAIN_OV_ROM = 0x08000, 0x0A000
    w = {}
    w[0x0000] = jump(0x20)                  # RESET
    w[0x0004] = RTI                         # IRQ2
    a = 0x20
    seq = [
        imm_si(INIT_OV_ROM >> 11),          # SI: ROM bank (DCS-95 window)
        imm_i0(INIT_OV_ROM & 0x7FF),
        imm_ax0(4),                         # 4 opcodes
        imm_i4(0x2800),                     # DCS-95 load address
        call(0x100),                        # overlay loader
        call(0x2800),                       # init overlay subroutine
        imm_si(MAIN_OV_ROM >> 11),
        imm_i0(MAIN_OV_ROM & 0x7FF),
        imm_ax0(6),
        imm_i4(0x2800),
        call(0x100),                        # loader again (resident overlay)
        call(0x200),                        # a third target ends the search
        jump(0x30),                         # on to the jump-table dispatch
    ]
    for op in seq:
        w[a] = op
        a += 1
    # the overlay loader + other sub
    w[0x100] = NOP
    w[0x101] = 0x0A000F                     # RTS
    w[0x200] = NOP
    w[0x201] = 0x0A000F
    # jump table dispatch in the main program: AY0-load then JUMP (I4)
    w[0x30] = 0x400000 | (0x60 << 4) | 4    # AY0 = $0060 (table base)
    w[0x31] = 0x0B000F | (0 << 6)           # JUMP (I4) always
    w[0x60] = jump(0x70)
    w[0x61] = jump(0x71)
    w[0x62] = NOP                           # ends the table
    w[0x70] = TRAP
    w[0x71] = TRAP
    words = [w.get(k, NOP) for k in range(0x300)]
    boot_block(words, u2, 0x1000)
    # overlays in ROM: recognizable opcodes
    pack_words([imm_ax0(0x111), RTI, NOP, NOP], u2, INIT_OV_ROM)
    pack_words([imm_ax0(0x222), NOP, NOP, NOP, NOP, RTI], u2, MAIN_OV_ROM)
    # make soft_boot detection see a JUMP at $1000
    return bytes(u2)


def test_soft_boot_overlays_and_jump_table():
    u2 = _soft_boot_u2()
    prog = dasmtrace.reconstruct(u2, 0x1000)
    assert prog.loader_sub == 0x100
    # resident overlay (second) loaded at 0x2800 with 6 words
    assert prog.overlays[1].base == 0x2800
    assert prog.overlays[1].end == 0x2800 + 6
    assert prog.code[0x2800] == 0x400000 | (0x222 << 4)
    # init overlay recorded separately
    assert prog.overlays[0].base == 0x2800
    assert prog.overlays[0].end >= 0x2800 + 4

    lines = dasmtrace.disassemble_program(u2, 0x1000)
    text = "\n".join(lines)
    assert "load overlay to PM($2800)" in text
    assert "call initialization overlay" in text
    assert "Initialization overlay" in text
    # jump-table heuristic annotated and traced both targets
    assert "in ($0060..$0061)" in text
    assert any(ln.startswith("0070") for ln in lines)
    assert any(ln.startswith("0071") for ln in lines)
    # init overlay body appears with its own opcode
    assert any("$0111" in ln or "0111" in ln for ln in lines)


def test_data_region_ff_collapse():
    u2 = bytearray(0x8000)
    w = {0: jump(0x20), 0x20: TRAP}
    words = [w.get(k, NOP) for k in range(0x28)]
    # fill the tail of the boot block with $FF data
    boot_block(words + [0xFFFFFF] * 24, u2, 0)
    for k in range(len(words), len(words) + 24):
        u2[k * 4 + 3] = 0xFF          # make the 4th byte $FF too
    lines = dasmtrace.disassemble_program(bytes(u2), 0)
    text = "\n".join(lines)
    assert "REPEAT" in text
