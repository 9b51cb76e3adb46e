// longbow_native: host-side native runtime pieces.
//
// The reference keeps its WAL hot path in optimized Go with CRC32
// framing and double-buffered flushing (reference:
// storage/batched_wal.go:188-423, encodeWALEntryHeader :423). Python's
// serving edge needs the same integrity/framing work off the
// interpreter: this library provides CRC32C (Castagnoli,
// slicing-by-8), WAL frame encode, and a full-file scan/verify that
// returns entry offsets without copying payloads. Built with plain
// g++ -O3 -shared; loaded via ctypes (no pybind11 in this image).
#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

static uint32_t crc32c_table[8][256];
static bool crc32c_init_done = false;

static void crc32c_init() {
    const uint32_t POLY = 0x82f63b78u;  // CRC-32C (Castagnoli), reflected
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t crc = i;
        for (int j = 0; j < 8; j++)
            crc = (crc >> 1) ^ ((crc & 1) ? POLY : 0);
        crc32c_table[0][i] = crc;
    }
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t crc = crc32c_table[0][i];
        for (int s = 1; s < 8; s++) {
            crc = crc32c_table[0][crc & 0xff] ^ (crc >> 8);
            crc32c_table[s][i] = crc;
        }
    }
    crc32c_init_done = true;
}

// CRC32C with slicing-by-8 (~1 byte/cycle scalar; SSE4.2 hardware CRC
// would be faster but this must run on any host the wheel lands on).
uint32_t lb_crc32c(const uint8_t* data, uint64_t len, uint32_t seed) {
    if (!crc32c_init_done) crc32c_init();
    uint32_t crc = ~seed;
    while (len >= 8) {
        uint64_t chunk;
        memcpy(&chunk, data, 8);
        crc ^= (uint32_t)chunk;
        uint32_t hi = (uint32_t)(chunk >> 32);
        crc = crc32c_table[7][crc & 0xff] ^
              crc32c_table[6][(crc >> 8) & 0xff] ^
              crc32c_table[5][(crc >> 16) & 0xff] ^
              crc32c_table[4][crc >> 24] ^
              crc32c_table[3][hi & 0xff] ^
              crc32c_table[2][(hi >> 8) & 0xff] ^
              crc32c_table[1][(hi >> 16) & 0xff] ^
              crc32c_table[0][hi >> 24];
        data += 8;
        len -= 8;
    }
    while (len--) crc = crc32c_table[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
    return ~crc;
}

// WAL frame layout (little-endian), after the reference's entry format
// [CRC32][Seq][TS][NameLen][RecLen][Name][ArrowIPC]
// (reference: batched_wal.go:423):
//   u32 crc32c   over everything after this field
//   u64 seq
//   f64 ts
//   u16 name_len
//   u8  kind      (0 = record batch IPC, 1 = op JSON)
//   u32 payload_len
//   name bytes, payload bytes
static const uint64_t HDR = 4 + 8 + 8 + 2 + 1 + 4;

uint64_t lb_wal_frame_size(uint16_t name_len, uint32_t payload_len) {
    return HDR + name_len + payload_len;
}

// Writes one frame into out (caller sizes it with lb_wal_frame_size).
uint64_t lb_wal_encode(
    uint8_t* out, uint64_t seq, double ts, const uint8_t* name,
    uint16_t name_len, uint8_t kind, const uint8_t* payload,
    uint32_t payload_len) {
    uint8_t* p = out + 4;
    memcpy(p, &seq, 8); p += 8;
    memcpy(p, &ts, 8); p += 8;
    memcpy(p, &name_len, 2); p += 2;
    *p++ = kind;
    memcpy(p, &payload_len, 4); p += 4;
    memcpy(p, name, name_len); p += name_len;
    memcpy(p, payload, payload_len); p += payload_len;
    uint64_t total = (uint64_t)(p - out);
    uint32_t crc = lb_crc32c(out + 4, total - 4, 0);
    memcpy(out, &crc, 4);
    return total;
}

// Scans a WAL buffer; fills offsets[] with the start of each valid
// frame. Returns the number of valid frames. Stops at the first
// corrupt frame (fail-fast, like the reference's CRC-verified replay,
// engine.go:160-220); *valid_bytes gets the clean prefix length.
int64_t lb_wal_scan(
    const uint8_t* buf, uint64_t len, uint64_t* offsets,
    int64_t max_entries, uint64_t* valid_bytes) {
    if (!crc32c_init_done) crc32c_init();
    uint64_t pos = 0;
    int64_t count = 0;
    while (pos + HDR <= len && count < max_entries) {
        uint32_t stored_crc;
        memcpy(&stored_crc, buf + pos, 4);
        uint16_t name_len;
        memcpy(&name_len, buf + pos + 4 + 8 + 8, 2);
        uint32_t payload_len;
        memcpy(&payload_len, buf + pos + 4 + 8 + 8 + 2 + 1, 4);
        uint64_t frame = HDR + name_len + payload_len;
        if (pos + frame > len) break;  // truncated tail
        uint32_t crc = lb_crc32c(buf + pos + 4, frame - 4, 0);
        if (crc != stored_crc) break;  // corrupt: fail fast
        offsets[count++] = pos;
        pos += frame;
    }
    *valid_bytes = pos;
    return count;
}

}  // extern "C"
