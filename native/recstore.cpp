// Native recorder store writer (.jvr files).
//
// The Python layer (joint_vae_tpu/save_load/native_store.py) owns the file
// format: it serializes the header and computes each array's aligned offset.
// This library owns the IO path: it materializes the whole file with large
// pwrite()s, computes the IEEE crc32 of the data region while writing
// (matching Python's zlib.crc32 so either side can verify), patches the
// checksum into the header, fdatasyncs, and atomically renames into place.
// Replaces np.savez for recorder persistence: writes at disk bandwidth
// (savez already does on this host; the win is the checksum + durability
// at no extra wall-clock) and — the headline — .jvr files open as
// zero-copy mmaps ~90x faster than npz loads (see docs/BENCH.md).
//
// Behavioral role: persistence tier of the reference's LossRecorder
// (ref utils/save_load/recorders.py:13-399) — format re-designed, not ported.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <unistd.h>

namespace {

// IEEE crc32 (reflected, poly 0xEDB88320) — bit-compatible with zlib.crc32.
// Slice-by-8: 8 table lookups per 8 input bytes instead of 8 shifts per
// byte; ~8x the plain table walk, so checksumming never gates the write.
const uint32_t (*crc_tables())[256] {
  static uint32_t t[8][256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      t[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; ++i)
      for (int s = 1; s < 8; ++s)
        t[s][i] = t[0][t[s - 1][i] & 0xFF] ^ (t[s - 1][i] >> 8);
    init = true;
  }
  return t;
}

uint32_t crc32_update(uint32_t crc, const uint8_t* p, size_t n) {
  const uint32_t(*t)[256] = crc_tables();
  crc ^= 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    w ^= crc;  // little-endian host (x86/arm64): low 4 bytes are the crc
    crc = t[7][w & 0xFF] ^ t[6][(w >> 8) & 0xFF] ^ t[5][(w >> 16) & 0xFF] ^
          t[4][(w >> 24) & 0xFF] ^ t[3][(w >> 32) & 0xFF] ^
          t[2][(w >> 40) & 0xFF] ^ t[1][(w >> 48) & 0xFF] ^ t[0][w >> 56];
    p += 8;
    n -= 8;
  }
  while (n--) crc = t[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

int write_all(int fd, const void* buf, uint64_t n, uint64_t off) {
  const uint8_t* p = static_cast<const uint8_t*>(buf);
  while (n) {
    ssize_t w = pwrite(fd, p, n, static_cast<off_t>(off));
    if (w < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    p += w;
    off += static_cast<uint64_t>(w);
    n -= static_cast<uint64_t>(w);
  }
  return 0;
}

}  // namespace

extern "C" {

// Write a complete .jvr file atomically.
//   header     : pre-serialized header bytes (crc field zeroed)
//   n_arrays   : number of data arrays
//   data/nbytes/offsets : per-array payload, absolute file offsets
//   total_len  : final file size (last offset + last nbytes, padded)
//   crc_offset : header offset of the u32 crc32-of-data-region field
//   sync       : nonzero = fdatasync before rename (power-loss durability;
//                costs a disk flush — recorders are a recomputable cache,
//                so the default caller leaves it off and relies on the
//                atomic rename + crc to catch torn files)
// Returns 0 on success, -errno on failure. On success *crc_out holds the
// data-region checksum that was patched into the header.
int jvtrec_write(const char* final_path,
                 const void* header, uint64_t header_len,
                 uint32_t n_arrays,
                 const void* const* data,
                 const uint64_t* nbytes,
                 const uint64_t* offsets,
                 uint64_t total_len,
                 uint64_t crc_offset,
                 int sync,
                 uint32_t* crc_out) {
  std::string tmp = std::string(final_path) + ".tmp";
  int fd = open(tmp.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -errno;

  int rc = 0;
  if (ftruncate(fd, static_cast<off_t>(total_len)) != 0) rc = -errno;
  if (rc == 0) rc = write_all(fd, header, header_len, 0);

  // Data region checksum covers [header_len, total_len) in file order,
  // including alignment padding (zeros from ftruncate). Arrays are written
  // in offset order so the rolling crc can cover the gaps as it goes.
  uint32_t crc = 0;
  uint64_t pos = header_len;
  static const uint8_t zeros[64] = {0};
  for (uint32_t i = 0; i < n_arrays && rc == 0; ++i) {
    while (pos < offsets[i]) {  // alignment gap
      uint64_t g = offsets[i] - pos;
      if (g > sizeof(zeros)) g = sizeof(zeros);
      crc = crc32_update(crc, zeros, g);
      pos += g;
    }
    rc = write_all(fd, data[i], nbytes[i], offsets[i]);
    crc = crc32_update(crc, static_cast<const uint8_t*>(data[i]), nbytes[i]);
    pos += nbytes[i];
  }
  while (pos < total_len && rc == 0) {  // trailing pad
    uint64_t g = total_len - pos;
    if (g > sizeof(zeros)) g = sizeof(zeros);
    crc = crc32_update(crc, zeros, g);
    pos += g;
  }

  if (rc == 0) rc = write_all(fd, &crc, sizeof(crc), crc_offset);
  if (rc == 0 && sync && fdatasync(fd) != 0) rc = -errno;
  if (close(fd) != 0 && rc == 0) rc = -errno;
  if (rc == 0 && rename(tmp.c_str(), final_path) != 0) rc = -errno;
  if (rc != 0) unlink(tmp.c_str());
  if (crc_out) *crc_out = crc;
  return rc;
}

// Recompute the data-region crc32 of an existing .jvr file.
// data_start/data_len delimit the region; returns 0 and fills *crc_out,
// or -errno on IO failure.
int jvtrec_crc(const char* path, uint64_t data_start, uint64_t data_len,
               uint32_t* crc_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;
  uint8_t buf[1 << 16];
  uint32_t crc = 0;
  uint64_t off = data_start, left = data_len;
  int rc = 0;
  while (left) {
    size_t want = left < sizeof(buf) ? static_cast<size_t>(left) : sizeof(buf);
    ssize_t r = pread(fd, buf, want, static_cast<off_t>(off));
    if (r < 0) {
      if (errno == EINTR) continue;
      rc = -errno;
      break;
    }
    if (r == 0) {  // short file
      rc = -EIO;
      break;
    }
    crc = crc32_update(crc, buf, static_cast<size_t>(r));
    off += static_cast<uint64_t>(r);
    left -= static_cast<uint64_t>(r);
  }
  close(fd);
  if (crc_out) *crc_out = crc;
  return rc;
}

}  // extern "C"
