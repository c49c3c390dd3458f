// Golden-oracle shim: C ABI wrapper around the *reference* implementation at
// /root/reference (read-only, compiled out-of-tree at test time).  This is not
// part of the framework; it exists solely so the test suite can obtain
// bit-exact golden vectors (encoded DCS streams and decoded PCM) to validate
// the from-scratch TPU-native implementation against.
//
// Reference usage mirrored here: DCSEncoderTester/EncoderTester.cpp:73-140
// (standalone decoder + LoadAudioStream), DCSEncoder/DCSEncoder.h:26-34
// (OpenStream/WriteStream/CloseStream).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <unordered_map>

#include "DCSDecoder.h"
#include "DCSDecoderNative.h"
#include "DCSEncoder.h"

namespace {

struct OracleHost : DCSDecoder::Host {
    std::vector<uint8_t> rx;
    void ReceiveDataPort(uint8_t d) override { rx.push_back(d); }
    void ClearDataPort() override { rx.clear(); }
    void BootTimerControl(bool) override {}
};

struct OracleDecoder {
    OracleHost host;
    DCSDecoderNative dec;
    std::list<DCSDecoder::ZipFileData> zipData;
    OracleDecoder() : dec(&host) {}
};

DCSDecoder::OSVersion OsFromCode(int os) {
    switch (os) {
    case 1: return DCSDecoder::OSVersion::OS93a;
    case 2: return DCSDecoder::OSVersion::OS93b;
    case 3: return DCSDecoder::OSVersion::OS94;
    case 4: return DCSDecoder::OSVersion::OS95;
    default: return DCSDecoder::OSVersion::Unknown;
    }
}

}  // namespace

extern "C" {

// ---- standalone decoder (stream-level oracle) ----

void* dcsref_create(int osCode, int defaultVolume) {
    auto* h = new OracleDecoder();
    h->dec.InitStandalone(OsFromCode(osCode));
    h->dec.SetDefaultVolume(defaultVolume);
    h->dec.SoftBoot();
    return h;
}

void dcsref_destroy(void* vh) { delete static_cast<OracleDecoder*>(vh); }

// Load a stream (raw DCS stream bytes: U16 frame count + header + bit data)
// into a channel with the given track-program mixing level (signed byte).
void dcsref_load_stream(void* vh, int channel, const uint8_t* data, int mixingLevel) {
    auto* h = static_cast<OracleDecoder*>(vh);
    DCSDecoder::ROMPointer rp(0, data);
    h->dec.LoadAudioStream(channel, rp, mixingLevel);
}

int dcsref_is_playing(void* vh, int channel) {
    return static_cast<OracleDecoder*>(vh)->dec.IsStreamPlaying(channel) ? 1 : 0;
}

void dcsref_next_samples(void* vh, int16_t* out, int n) {
    auto* h = static_cast<OracleDecoder*>(vh);
    for (int i = 0; i < n; ++i) out[i] = h->dec.GetNextSample();
}

void dcsref_write_data_port(void* vh, uint8_t b) {
    static_cast<OracleDecoder*>(vh)->dec.WriteDataPort(b);
}

void dcsref_set_master_volume(void* vh, int vol) {
    static_cast<OracleDecoder*>(vh)->dec.SetMasterVolume(vol);
}

// drain the DCS->host data-port bytes captured since the last call
int dcsref_read_host_bytes(void* vh, uint8_t* out, int cap) {
    auto* h = static_cast<OracleDecoder*>(vh);
    int n = static_cast<int>(h->host.rx.size());
    if (n > cap) n = cap;
    memcpy(out, h->host.rx.data(), n);
    h->host.rx.erase(h->host.rx.begin(), h->host.rx.begin() + n);
    return n;
}

// stream metadata: returns frame count, byte size, type, subtype
int dcsref_stream_info(void* vh, const uint8_t* data,
                       int* nFrames, int* nBytes, int* type, int* subType) {
    auto* h = static_cast<OracleDecoder*>(vh);
    DCSDecoder::ROMPointer rp(0, data);
    auto info = h->dec.GetStreamInfo(rp);
    *nFrames = info.nFrames;
    *nBytes = info.nBytes;
    *type = info.formatType;
    *subType = info.formatSubType;
    return 0;
}

// ---- ROM-based decoder (full-pipeline oracle) ----

void* dcsref_create_rom(const uint8_t* const* roms, const uint32_t* sizes,
                        int defaultVolume, int fastBoot) {
    auto* h = new OracleDecoder();
    for (int i = 0; i < 8; ++i) {
        if (roms[i] != nullptr && sizes[i] != 0)
            h->dec.AddROM(i + 2, roms[i], sizes[i]);
    }
    h->dec.SetDefaultVolume(defaultVolume);
    h->dec.SetFastBootMode(fastBoot != 0);
    return h;
}

int dcsref_check_roms(void* vh) {
    return static_cast<OracleDecoder*>(vh)->dec.CheckROMs();
}

void dcsref_hard_boot(void* vh) { static_cast<OracleDecoder*>(vh)->dec.HardBoot(); }
void dcsref_soft_boot(void* vh) { static_cast<OracleDecoder*>(vh)->dec.SoftBoot(); }
int dcsref_is_ok(void* vh) { return static_cast<OracleDecoder*>(vh)->dec.IsOK() ? 1 : 0; }

// version info: returns (hw << 24) | (os << 16) | nominalVersion
// hw: 0=unknown 1=invalid 2=DCS93 3=DCS95; os: 0=unknown 1=invalid 2=93a 3=93b 4=94 5=95
unsigned dcsref_version_info(void* vh) {
    auto* h = static_cast<OracleDecoder*>(vh);
    DCSDecoder::HWVersion hw;
    DCSDecoder::OSVersion os;
    h->dec.GetVersionInfo(&hw, &os);
    unsigned hwc = 0, osc = 0;
    switch (hw) {
    case DCSDecoder::HWVersion::Invalid: hwc = 1; break;
    case DCSDecoder::HWVersion::DCS93: hwc = 2; break;
    case DCSDecoder::HWVersion::DCS95: hwc = 3; break;
    default: break;
    }
    switch (os) {
    case DCSDecoder::OSVersion::Invalid: osc = 1; break;
    case DCSDecoder::OSVersion::OS93a: osc = 2; break;
    case DCSDecoder::OSVersion::OS93b: osc = 3; break;
    case DCSDecoder::OSVersion::OS94: osc = 4; break;
    case DCSDecoder::OSVersion::OS95: osc = 5; break;
    default: break;
    }
    return (hwc << 24) | (osc << 16)
        | static_cast<unsigned>(h->dec.GetVersionNumber() & 0xFFFF);
}

int dcsref_num_channels(void* vh) {
    return static_cast<OracleDecoder*>(vh)->dec.GetNumChannels();
}

int dcsref_max_track(void* vh) {
    return static_cast<OracleDecoder*>(vh)->dec.GetMaxTrackNumber();
}

// track info: fills [address, channel, type, deferCode, time, looping]
int dcsref_track_info(void* vh, int trackNo, uint32_t* out6) {
    auto* h = static_cast<OracleDecoder*>(vh);
    DCSDecoder::TrackInfo ti;
    if (!h->dec.GetTrackInfo(static_cast<uint16_t>(trackNo), ti)) return 0;
    out6[0] = ti.address;
    out6[1] = static_cast<uint32_t>(ti.channel);
    out6[2] = static_cast<uint32_t>(ti.type);
    out6[3] = ti.deferCode;
    out6[4] = ti.time;
    out6[5] = ti.looping ? 1 : 0;
    return 1;
}

// ---- encoder (stream-generation oracle) ----

// Encode PCM (at 31,250 Hz) into a DCS stream.  Returns byte count, or
// negative on error.  fmtType/fmtSubType: -1 means search (reference default).
int dcsref_encode(const int16_t* pcm, int nSamples, int sampleRate,
                  int fmtType, int fmtSubType, int targetBitRate,
                  float powerBandCutoff, float maxQuantErr,
                  uint8_t* out, int outCap, int* nFrames) {
    DCSEncoder enc;
    enc.compressionParams.streamFormatType = fmtType;
    enc.compressionParams.streamFormatSubType = fmtSubType;
    if (targetBitRate > 0) enc.compressionParams.targetBitRate = targetBitRate;
    if (powerBandCutoff > 0) enc.compressionParams.powerBandCutoff = powerBandCutoff;
    if (maxQuantErr > 0) enc.compressionParams.maximumQuantizationError = maxQuantErr;

    std::string err;
    auto* s = enc.OpenStream(sampleRate, err);
    if (s == nullptr) return -1;
    // Use the float overload: the reference's int16 WriteStream overload has a
    // double-increment bug (DCSEncoder.cpp:638) that its own CLI never hits
    // (EncodeFile feeds floats).
    std::vector<float> f(static_cast<size_t>(nSamples));
    for (int i = 0; i < nSamples; ++i) f[i] = pcm[i] / 32768.0f;
    enc.WriteStream(s, f.data(), f.size());
    DCSEncoder::DCSAudio obj;
    if (!enc.CloseStream(s, obj, err)) return -2;
    if (static_cast<int>(obj.nBytes) > outCap) return -3;
    memcpy(out, obj.data.get(), obj.nBytes);
    *nFrames = obj.nFrames;
    return static_cast<int>(obj.nBytes);
}

}  // extern "C"

// ---- disassembler oracle ----
extern unsigned adsp2100_dasm(char* buffer, unsigned long op);

extern "C" int dcsref_dasm(unsigned op, char* buf, int cap) {
    char tmp[512];
    adsp2100_dasm(tmp, op);
    int n = static_cast<int>(strlen(tmp));
    if (n >= cap) n = cap - 1;
    memcpy(buf, tmp, n);
    buf[n] = 0;
    return n;
}
