// tachikoma_tpu native trace writer/verifier.
//
// The bit-stable binary serializer for tachikoma-standard traces — the
// native component replacing the reference's C++ trace-emitting runtime
// (src/runtime/contrib/tachikoma/tachikoma_json_runtime.cc): record
// encoding, CRC32 integrity, streaming file output, and an mmap-based
// integrity verifier.  Byte-layout contract is defined (and cross-tested
// byte-for-byte) against tachikoma_tpu/trace/format.py.
//
// Build: g++ -O2 -shared -fPIC -o libtktrace.so trace_writer.cpp -lz
// Binding: ctypes (tachikoma_tpu/trace/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

constexpr char kMagic[8] = {'T', 'K', 'T', 'R', 'A', 'C', 'E', '1'};
constexpr char kEndMagic[8] = {'T', 'K', 'E', 'N', 'D', '\0', '\0', '\0'};
constexpr uint32_t kVersion = 1;

struct Writer {
  FILE* f = nullptr;
  uint64_t offset = 0;      // bytes written (CRC-covered region)
  uint32_t crc = 0;         // running file CRC
  std::vector<std::pair<uint32_t, uint64_t>> index;
  // current record under construction
  std::vector<uint8_t> rec;
  uint32_t rec_node_id = 0;
  bool in_record = false;
  bool failed = false;

  void put(const void* p, size_t n) {
    if (failed) return;
    if (fwrite(p, 1, n, f) != n) { failed = true; return; }
    crc = static_cast<uint32_t>(
        crc32(crc, reinterpret_cast<const Bytef*>(p), static_cast<uInt>(n)));
    offset += n;
  }

  template <typename T>
  void put_le(T v) {  // host is little-endian on all deployment targets
    put(&v, sizeof(T));
  }

  void rec_put(const void* p, size_t n) {
    const uint8_t* b = static_cast<const uint8_t*>(p);
    rec.insert(rec.end(), b, b + n);
  }

  template <typename T>
  void rec_le(T v) {
    rec_put(&v, sizeof(T));
  }
};

}  // namespace

extern "C" {

void* tk_writer_open(const char* path, const uint8_t* graph_hash /*32B*/,
                     const char* meta_json, uint32_t meta_len,
                     uint64_t num_records) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  Writer* w = new Writer();
  w->f = f;
  w->put(kMagic, 8);
  w->put_le<uint32_t>(kVersion);
  w->put_le<uint32_t>(0);  // flags
  w->put(graph_hash, 32);
  w->put_le<uint64_t>(num_records);
  w->put_le<uint32_t>(meta_len);
  w->put(meta_json, meta_len);
  if (w->failed) { fclose(f); delete w; return nullptr; }
  return w;
}

int tk_record_begin(void* wp, uint32_t node_id, uint32_t op_id,
                    const char* name, uint16_t name_len,
                    const char* op_name, uint16_t op_name_len,
                    const char* attrs_json, uint32_t attrs_len,
                    uint16_t num_tensors) {
  Writer* w = static_cast<Writer*>(wp);
  if (w->in_record) return -1;
  w->rec.clear();
  w->rec_node_id = node_id;
  w->in_record = true;
  w->rec_le<uint32_t>(node_id);
  w->rec_le<uint32_t>(op_id);
  w->rec_le<uint16_t>(name_len);
  w->rec_put(name, name_len);
  w->rec_le<uint16_t>(op_name_len);
  w->rec_put(op_name, op_name_len);
  w->rec_le<uint32_t>(attrs_len);
  w->rec_put(attrs_json, attrs_len);
  w->rec_le<uint16_t>(num_tensors);
  return 0;
}

int tk_record_tensor(void* wp, uint8_t role, uint8_t dtype_code, uint8_t ndim,
                     const uint32_t* dims, const uint8_t* data,
                     uint64_t data_len) {
  Writer* w = static_cast<Writer*>(wp);
  if (!w->in_record) return -1;
  w->rec_le<uint8_t>(role);
  w->rec_le<uint8_t>(dtype_code);
  w->rec_le<uint8_t>(ndim);
  for (uint8_t i = 0; i < ndim; ++i) w->rec_le<uint32_t>(dims[i]);
  w->rec_le<uint64_t>(data_len);
  w->rec_put(data, data_len);
  return 0;
}

int tk_record_end(void* wp) {
  Writer* w = static_cast<Writer*>(wp);
  if (!w->in_record) return -1;
  uint32_t rec_crc = static_cast<uint32_t>(
      crc32(0, w->rec.data(), static_cast<uInt>(w->rec.size())));
  uint64_t payload_len = w->rec.size() + 4;
  w->index.emplace_back(w->rec_node_id, w->offset);
  w->put_le<uint64_t>(payload_len);
  w->put(w->rec.data(), w->rec.size());
  w->put_le<uint32_t>(rec_crc);
  w->in_record = false;
  return w->failed ? -2 : 0;
}

int tk_writer_finish(void* wp) {
  Writer* w = static_cast<Writer*>(wp);
  uint64_t index_offset = w->offset;
  for (const auto& e : w->index) {
    w->put_le<uint32_t>(e.first);
    w->put_le<uint64_t>(e.second);
  }
  w->put_le<uint64_t>(index_offset);
  // file CRC + end magic are outside the CRC-covered region
  uint32_t fcrc = w->crc;
  int rc = 0;
  if (fwrite(&fcrc, 1, 4, w->f) != 4) rc = -2;
  if (fwrite(kEndMagic, 1, 8, w->f) != 8) rc = -2;
  if (w->failed) rc = -2;
  if (fclose(w->f) != 0) rc = -2;
  delete w;
  return rc;
}

// Verify header/footer magic, file CRC, and every record CRC via mmap.
// Returns number of records on success, negative error code on failure.
//   -1 open/stat, -2 magic, -3 file crc, -4 record crc, -5 structure
int64_t tk_trace_verify(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8 + 8 + 32 + 8 + 4 + 20) {
    close(fd);
    return -1;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const uint8_t* p = static_cast<const uint8_t*>(
      mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (p == MAP_FAILED) return -1;
  int64_t result = -5;
  do {
    if (memcmp(p, kMagic, 8) != 0 || memcmp(p + size - 8, kEndMagic, 8) != 0) {
      result = -2;
      break;
    }
    uint32_t fcrc;
    memcpy(&fcrc, p + size - 12, 4);
    uint32_t crc = static_cast<uint32_t>(
        crc32(0, p, static_cast<uInt>(size - 12)));
    if (crc != fcrc) {
      result = -3;
      break;
    }
    uint64_t num_records, meta_len_offset = 8 + 4 + 4 + 32;
    memcpy(&num_records, p + meta_len_offset, 8);
    uint64_t index_offset;
    memcpy(&index_offset, p + size - 20, 8);
    bool ok = true;
    for (uint64_t i = 0; i < num_records && ok; ++i) {
      uint64_t roff;
      memcpy(&roff, p + index_offset + i * 12 + 4, 8);
      if (roff + 8 > size) { ok = false; result = -5; break; }
      uint64_t rlen;
      memcpy(&rlen, p + roff, 8);
      if (roff + 8 + rlen > size || rlen < 4) { ok = false; result = -5; break; }
      uint32_t rcrc;
      memcpy(&rcrc, p + roff + 8 + rlen - 4, 4);
      uint32_t c = static_cast<uint32_t>(
          crc32(0, p + roff + 8, static_cast<uInt>(rlen - 4)));
      if (c != rcrc) { ok = false; result = -4; break; }
    }
    if (ok) result = static_cast<int64_t>(num_records);
  } while (false);
  munmap(const_cast<uint8_t*>(p), size);
  return result;
}

}  // extern "C"
