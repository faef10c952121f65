// tktrace — native CLI for tachikoma-standard trace files.
//
// The standalone reader/inspector complementing the writer
// (trace_writer.cpp): header/meta dump, per-op record histogram, index
// sanity, and full CRC verification — the role of the reference fork's
// native trace-consuming tooling, mmap-based so multi-GB traces inspect in
// milliseconds.  Byte layout per tachikoma_tpu/trace/format.py.
//
// Build: g++ -O2 -o tktrace tktrace_cli.cpp -lz
// Usage: tktrace info <file> | tktrace verify <file>

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

constexpr char kMagic[8] = {'T', 'K', 'T', 'R', 'A', 'C', 'E', '1'};
constexpr char kEndMagic[8] = {'T', 'K', 'E', 'N', 'D', '\0', '\0', '\0'};

struct Map {
  const uint8_t* p = nullptr;
  size_t n = 0;
  int fd = -1;
  bool ok() const { return p != nullptr; }
};

Map map_file(const char* path) {
  Map m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size <= 0) return m;
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) return m;
  m.p = static_cast<const uint8_t*>(p);
  m.n = static_cast<size_t>(st.st_size);
  return m;
}

template <typename T>
T rd(const uint8_t* p) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  return v;
}

struct Header {
  uint32_t version = 0, flags = 0, meta_len = 0;
  uint64_t num_records = 0;
  const uint8_t* graph_hash = nullptr;
  size_t body = 0;  // offset of the first record
  bool ok = false;
};

Header parse_header(const Map& m) {
  Header h;
  if (m.n < 8 + 4 + 4 + 32 + 8 + 4) return h;
  if (std::memcmp(m.p, kMagic, 8) != 0) return h;
  size_t o = 8;
  h.version = rd<uint32_t>(m.p + o); o += 4;
  h.flags = rd<uint32_t>(m.p + o); o += 4;
  h.graph_hash = m.p + o; o += 32;
  h.num_records = rd<uint64_t>(m.p + o); o += 8;
  h.meta_len = rd<uint32_t>(m.p + o); o += 4;
  if (o + h.meta_len > m.n) return h;
  h.body = o + h.meta_len;
  h.ok = true;
  return h;
}

int cmd_info(const char* path) {
  Map m = map_file(path);
  if (!m.ok()) { fprintf(stderr, "tktrace: cannot map %s\n", path); return 2; }
  Header h = parse_header(m);
  if (!h.ok) { fprintf(stderr, "tktrace: bad header\n"); return 2; }
  printf("file            %s\n", path);
  printf("size            %zu bytes\n", m.n);
  printf("version         %u  flags %u\n", h.version, h.flags);
  printf("records         %" PRIu64 "\n", h.num_records);
  printf("graph_hash      ");
  for (int i = 0; i < 8; i++) printf("%02x", h.graph_hash[i]);
  printf("...\n");
  printf("meta            %.*s\n", static_cast<int>(h.meta_len),
         reinterpret_cast<const char*>(m.p + h.body - h.meta_len));

  // walk records: per-op histogram
  struct Agg { uint64_t count = 0, bytes = 0; };
  std::map<std::string, Agg> ops;
  size_t o = h.body;
  for (uint64_t r = 0; r < h.num_records; r++) {
    if (o + 8 > m.n) { fprintf(stderr, "truncated at record %" PRIu64 "\n", r); return 2; }
    uint64_t len = rd<uint64_t>(m.p + o);
    const uint8_t* rec = m.p + o + 8;
    if (o + 8 + len > m.n) { fprintf(stderr, "record %" PRIu64 " overruns file\n", r); return 2; }
    size_t ro = 8;  // node_id + op_id
    uint16_t name_len = rd<uint16_t>(rec + ro); ro += 2 + name_len;
    uint16_t op_len = rd<uint16_t>(rec + ro); ro += 2;
    std::string op(reinterpret_cast<const char*>(rec + ro), op_len);
    Agg& a = ops[op];
    a.count++;
    a.bytes += len + 8;
    o += 8 + len;
  }
  printf("\n%-28s %8s %14s\n", "op", "count", "bytes");
  for (const auto& kv : ops)
    printf("%-28s %8" PRIu64 " %14" PRIu64 "\n", kv.first.c_str(),
           kv.second.count, kv.second.bytes);

  // index + footer sanity
  if (m.n >= 8 + 4 + 8) {
    const uint8_t* foot = m.p + m.n - (8 + 4 + 8);
    uint64_t index_off = rd<uint64_t>(foot);
    uint32_t file_crc = rd<uint32_t>(foot + 8);
    bool endok = std::memcmp(foot + 12, kEndMagic, 8) == 0;
    printf("\nindex_offset    %" PRIu64 "  (records end at %zu)\n", index_off, o);
    printf("file_crc        %08x\n", file_crc);
    printf("end_magic       %s\n", endok ? "ok" : "BAD");
  }
  return 0;
}

int cmd_verify(const char* path) {
  Map m = map_file(path);
  if (!m.ok()) { fprintf(stderr, "tktrace: cannot map %s\n", path); return 2; }
  Header h = parse_header(m);
  if (!h.ok) { fprintf(stderr, "tktrace: bad header\n"); return 2; }
  const uint8_t* foot = m.p + m.n - (8 + 4 + 8);
  if (std::memcmp(foot + 12, kEndMagic, 8) != 0) {
    fprintf(stderr, "tktrace: bad end magic\n"); return 1;
  }
  uint64_t index_off = rd<uint64_t>(foot);
  uint32_t file_crc = rd<uint32_t>(foot + 8);
  // whole-file CRC covers everything before the crc field itself
  // (header + records + index + index_offset), i.e. [0, len - 12)
  uint32_t crc = crc32(0, m.p, static_cast<uInt>(m.n - 12));
  if (crc != file_crc) {
    fprintf(stderr, "tktrace: file CRC mismatch (%08x != %08x)\n", crc, file_crc);
    return 1;
  }
  // per-record CRCs
  size_t o = h.body;
  for (uint64_t r = 0; r < h.num_records; r++) {
    uint64_t len = rd<uint64_t>(m.p + o);
    const uint8_t* rec = m.p + o + 8;
    if (len < 4 || o + 8 + len > m.n) { fprintf(stderr, "record %" PRIu64 " truncated\n", r); return 1; }
    uint32_t want = rd<uint32_t>(rec + len - 4);
    uint32_t got = crc32(0, rec, static_cast<uInt>(len - 4));
    if (want != got) {
      fprintf(stderr, "record %" PRIu64 " CRC mismatch\n", r);
      return 1;
    }
    o += 8 + len;
  }
  if (o != index_off) {
    fprintf(stderr, "tktrace: index offset mismatch (%zu != %" PRIu64 ")\n", o, index_off);
    return 1;
  }
  printf("OK: %" PRIu64 " records, file CRC %08x\n", h.num_records, file_crc);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3 || (std::strcmp(argv[1], "info") != 0 &&
                    std::strcmp(argv[1], "verify") != 0)) {
    fprintf(stderr, "usage: tktrace info|verify <trace-file>\n");
    return 2;
  }
  return std::strcmp(argv[1], "info") == 0 ? cmd_info(argv[2])
                                           : cmd_verify(argv[2]);
}
