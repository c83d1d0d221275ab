// Internal cross-TU declarations for the hpfw native runtime (not ABI).
#pragma once

#include <cstdint>
#include <vector>

// One-pass MPEG audio decode into a growable buffer (hpfw_mp3.cc). The
// extern-C two-call entry point hpfw_mp3_decode wraps this; the threaded
// ingest driver (hpfw_native.cc) calls it directly so batch ingestion
// decodes each file exactly once.
int hpfw_mp3_decode_vec(const uint8_t* data, int64_t size,
                        std::vector<float>* out, int32_t* sample_rate);

// One-pass ADTS AAC-LC decode into a growable buffer (hpfw_aac.cc), mono
// channel-mean downmix; same two-call extern-C wrapper pattern as MP3.
int hpfw_aac_decode_vec(const uint8_t* data, int64_t size,
                        std::vector<float>* out, int32_t* sample_rate);

// Verified-chain ADTS sync scan (chain of 3 headers or end-of-stream).
int64_t hpfw_aac_find_sync(const uint8_t* d, int64_t n, int64_t pos);

// One-pass Ogg Opus (CELT) decode into a growable buffer (hpfw_opus.cc),
// mono downmix, 48 kHz out; final_range (nullable) receives the last
// frame's range-coder state for bit-exact sync certification.
int hpfw_opus_decode_vec(const uint8_t* data, int64_t size,
                         std::vector<float>* out, int32_t* sample_rate,
                         uint32_t* final_range);
