// dcsexplorer_tpu native host runtime — stream indexing and dense symbol
// decode for the 1994+ DCS stream family.
//
// This is the framework's C++ counterpart to the reference's native C++
// runtime layer: the one truly serial part of the codec (walking the
// variable-length bitstream) runs here at memory speed, producing the
// per-frame index and dense per-slot sample/control arrays that the TPU
// kernels consume (see ops/prescan.py and ops/band_decode.py for the
// documented semantics; format anchors: reference DCSDecoderNative.cpp:
// 1679-2261).  Written from scratch against dcsexplorer_tpu's own Python
// implementation; validated bit-identically against it by tests.
//
// Build: see dcsexplorer_tpu/native/build.py (ctypes ABI).

#include <stdint.h>
#include <string.h>

#include "dcs_tables.h"

namespace {

struct BitReader {
    const uint8_t* mem;
    int len;
    int pos;        // next byte to pull
    uint32_t buf;   // left-justified lookahead
    int nbits;

    void init(const uint8_t* m, int l, int p) {
        mem = m; len = l; pos = p; buf = 0; nbits = 0;
    }
    inline uint8_t byteAt(int i) const { return i < len ? mem[i] : 0xFF; }
    inline uint32_t peek(int n) {
        while (nbits <= n) {
            buf |= static_cast<uint32_t>(byteAt(pos)) << (24 - nbits);
            ++pos;
            nbits += 8;
        }
        return buf >> (32 - n);
    }
    inline uint32_t get(int n) {
        uint32_t v = peek(n);
        nbits -= n;
        buf <<= n;
        return v;
    }
    inline int64_t cursor() const {
        return static_cast<int64_t>(pos) * 8 - nbits;
    }
};

}  // namespace

extern "C" {

// Read the frame count of a stream (first U16).
int dcs94_frame_count(const uint8_t* mem, int len, int pos) {
    if (pos + 2 > len) return -1;
    return (mem[pos] << 8) | mem[pos + 1];
}

// Index a 1994+ stream and emit dense values + slot controls.
//
// Outputs (caller-allocated, F = frame count):
//   header16      [16]      stream header copy
//   meta          [4]       {fmt_type, sub_type, error_frame, max_symbols}
//   start_bit     [F]       absolute first-sample bit offset (int64)
//   end_bit       [F]       one past the frame's last bit (int64)
//   band_type     [F*16]    absolute band types (post-delta)
//   band_type_prev[F*16]    band types before this frame's deltas
//   dense         [F*256]   sample values (u16 storage, int32)
//   scale         [F*256]   per-slot scale factor
//   fb_idx        [F*256]   frame-buffer target index (int16)
//   valid         [F*256]   1 if the slot holds a decoded sample
//
// Any output pointer may be null to skip it.  Returns 0 on success.
int dcs94_decode_dense(const uint8_t* mem, int len, int pos,
                       uint8_t* header16, int32_t* meta,
                       int64_t* start_bit, int64_t* end_bit,
                       int32_t* band_type, int32_t* band_type_prev,
                       int32_t* dense, int32_t* scale,
                       int16_t* fb_idx, uint8_t* valid) {
    int n_frames = dcs94_frame_count(mem, len, pos);
    if (n_frames < 0) return -1;
    int hdr_pos = pos + 2;

    uint8_t header[16];
    for (int i = 0; i < 16; ++i)
        header[i] = hdr_pos + i < len ? mem[hdr_pos + i] : 0xFF;
    if (header16) memcpy(header16, header, 16);

    int fmt_type = (header[0] & 0x80) >> 7;
    int sub_type = ((header[1] & 0x80) >> 6) | ((header[2] & 0x80) >> 7);
    const int32_t* preadj_map = (sub_type == 0) ? kPreAdj0 : kPreAdj3;

    int n_hdr = 16;
    for (int i = 0; i < 16; ++i) {
        if ((header[i] & 0x7F) == 0x7F) { n_hdr = i; break; }
    }

    BitReader bit;
    bit.init(mem, len, hdr_pos + 16);
    int bt[16];
    memset(bt, 0, sizeof(bt));
    int error_frame = -1;
    int max_symbols = 0;

    for (int f = 0; f < n_frames; ++f) {
        if (band_type_prev) {
            for (int i = 0; i < 16; ++i) band_type_prev[f * 16 + i] = bt[i];
        }
        int preadj[3] = {0, 0, 0};
        for (int i = 0; i < 3; ++i)
            preadj[i] = preadj_map[bt[i] & 0xF];

        // differential band-type header
        for (int i = 0; i < n_hdr; ++i) {
            int node = 0;
            for (;;) {
                uint32_t b = bit.get(1);
                node += b ? kHuffTree94[node] : 1;
                if (kHuffTree94[node] & 0x8000) break;
            }
            bt[i] = (bt[i] + (kHuffTree94[node] & 0xFF) - 0x2E) & 0xFFFF;
        }
        if (band_type) {
            for (int i = 0; i < 16; ++i) band_type[f * 16 + i] = bt[i];
        }
        if (start_bit) start_bit[f] = bit.cursor();

        int32_t* dv = dense ? dense + f * 256 : nullptr;
        int32_t* sv = scale ? scale + f * 256 : nullptr;
        int16_t* fv = fb_idx ? fb_idx + f * 256 : nullptr;
        uint8_t* vv = valid ? valid + f * 256 : nullptr;
        if (dv) memset(dv, 0, 256 * sizeof(int32_t));
        if (sv) memset(sv, 0, 256 * sizeof(int32_t));
        if (fv) memset(fv, 0, 256 * sizeof(int16_t));
        if (vv) memset(vv, 0, 256);

        int d = 0;        // dense slot index
        int out_idx = 1;  // frame-buffer index
        int n_sym = 0;
        bool ok = true;

        for (int band = 0; band < n_hdr; ++band) {
            int cur_hdr = header[band] & 0x7F;
            int out_count = kBandOutputCount[band];
            int out_inc = 1;
            if (cur_hdr & 0x40) { out_inc = 2; out_count /= 2; }

            int code = bt[band];
            if (code == 0) { out_idx += out_count; continue; }

            int scale_code = cur_hdr;
            if (fmt_type != 0) {
                const int32_t* xlat = band < 3 ? kXlat02
                                     : band < 6 ? kXlat35 : kXlat6F;
                int c15 = code & 0xF;
                if (code > 15 && error_frame < 0) error_frame = f;
                int adj_hdr = cur_hdr + (band < 3 ? preadj[band] : 0);
                scale_code = adj_hdr + xlat[c15 * 2 + 1];
                code = xlat[c15 * 2];
            }
            if (code == 0) {
                if (error_frame < 0) error_frame = f;
                ok = false;
                break;
            }
            int sf = (kScaleMantissa[scale_code & 3]
                      >> (15 - ((scale_code >> 2) & 0xF))) & 0xFFFF;

            if (code <= 6) {
                int ref = 1 << (code - 1);
                int maxw = kMaxBitWidth[code];
                const int32_t* book = kCodebookFlat + kCodebookBase[code];
                for (int i = out_count; i != 0; --i) {
                    int entry = book[bit.peek(maxw)];
                    bit.get(entry >> 8);
                    ++n_sym;
                    if (entry & 0x80) {
                        if (i >= 2) { d += 2; out_idx += 2 * out_inc; --i; }
                        else {
                            if (error_frame < 0) error_frame = f;
                            ok = false;
                            i = 1;
                        }
                    } else {
                        int val = ((entry & 0x7F) - ref) & 0xFFFF;
                        if (dv && d < 256) {
                            dv[d] = val;
                            sv[d] = sf;
                            fv[d] = static_cast<int16_t>(out_idx);
                            vv[d] = 1;
                        }
                        ++d;
                        out_idx += out_inc;
                    }
                }
            } else {
                int w = code <= 17 ? code : 17;
                for (int i = 0; i < out_count; ++i) {
                    uint32_t raw = bit.get(w);
                    int val = static_cast<int>(raw);
                    if (val & (1 << (w - 1))) val -= 1 << w;
                    if (dv && d < 256) {
                        dv[d] = val & 0xFFFF;
                        sv[d] = sf;
                        fv[d] = static_cast<int16_t>(out_idx);
                        vv[d] = 1;
                    }
                    ++d;
                    out_idx += out_inc;
                }
                n_sym += out_count;
            }
            if (!ok) break;
        }

        // Note: "emit two zeros" pairs advance d without setting valid —
        // accumulating a zero sample is an exact no-op, so skipping the
        // store is exact.  Frames flagged in error_frame are rejected by the
        // host loader (they stop the channel in the reference), so their
        // partial contents are never played.

        max_symbols = n_sym > max_symbols ? n_sym : max_symbols;
        if (end_bit) end_bit[f] = bit.cursor();
        (void)ok;
    }

    if (meta) {
        meta[0] = fmt_type;
        meta[1] = sub_type;
        meta[2] = error_frame;
        meta[3] = max_symbols;
    }
    return 0;
}

}  // extern "C"
