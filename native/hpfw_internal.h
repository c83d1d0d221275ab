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
