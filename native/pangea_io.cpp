// Native FASTA/FASTQ ingest + 2-bit base encoding (SURVEY.md C1/C2, §3.2).
//
// The TPU-native framework keeps its hot parse on the host CPU: a kseq-style
// buffered record scanner over zlib (transparent gzip), encoding bases
// directly into the padded int8 [batch, max_len] code matrix the device
// consumes (SEMANTICS.md §1: A/C/G/T/U case-insensitive → 0..3, everything
// else → 4; pad = 4). Exposed as a plain C ABI for ctypes — no pybind11 in
// this environment.
//
// Semantics contract: byte-identical encoding to
// pangea_tpu.core.semantics_np._BASE_LUT (tested in tests/test_io_native.py).

#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr size_t kChunk = 1 << 20;  // 1 MiB read chunks
constexpr int8_t kPad = 4;

struct Lut {
  unsigned char enc[256];
  Lut() {
    std::memset(enc, 4, sizeof(enc));
    const char* bases = "ACGTU";
    const unsigned char codes[] = {0, 1, 2, 3, 3};
    for (int i = 0; i < 5; ++i) {
      enc[(unsigned char)bases[i]] = codes[i];
      enc[(unsigned char)(bases[i] + 32)] = codes[i];  // lowercase
    }
  }
};
const Lut kLut;

struct Reader {
  gzFile f = nullptr;
  std::string buf;      // unconsumed bytes
  size_t pos = 0;       // parse cursor into buf
  bool stream_eof = false;
  int format = 0;       // 1 = fasta, 2 = fastq
  std::string err;
  std::string seq_scratch;

  bool fill() {
    // Append up to kChunk more bytes; false at stream EOF.
    if (stream_eof) return false;
    size_t old = buf.size();
    buf.resize(old + kChunk);
    int n = gzread(f, &buf[old], kChunk);
    if (n < 0) {
      int zerr = 0;
      err = std::string("gzread: ") + gzerror(f, &zerr);
      buf.resize(old);
      stream_eof = true;
      return false;
    }
    buf.resize(old + (size_t)n);
    if ((size_t)n < kChunk) stream_eof = true;
    return n > 0;
  }

  // Next line [start, end) excluding newline; false at EOF with no bytes.
  bool getline(size_t* start, size_t* end) {
    for (;;) {
      size_t nl = buf.find('\n', pos);
      if (nl != std::string::npos) {
        *start = pos;
        *end = (nl > pos && buf[nl - 1] == '\r') ? nl - 1 : nl;
        pos = nl + 1;
        return true;
      }
      if (!stream_eof) {
        // Compact consumed prefix, then read more.
        if (pos > 0) {
          buf.erase(0, pos);
          pos = 0;
        }
        fill();
        continue;
      }
      if (pos < buf.size()) {  // final line without newline
        *start = pos;
        *end = buf.size();
        pos = buf.size();
        return true;
      }
      return false;
    }
  }

  bool peek_format() {
    if (format) return true;
    while (buf.size() <= pos && !stream_eof) fill();
    if (buf.size() <= pos) {
      err = "empty input";
      return false;
    }
    char c = buf[pos];
    if (c == '>') format = 1;
    else if (c == '@') format = 2;
    else {
      err = "not FASTA/FASTQ";
      return false;
    }
    return true;
  }
};

inline void encode_row(const char* seq, size_t n, size_t max_len,
                       int8_t* row, int32_t* len_out) {
  size_t m = n < max_len ? n : max_len;
  for (size_t i = 0; i < m; ++i)
    row[i] = (int8_t)kLut.enc[(unsigned char)seq[i]];
  if (m < max_len) std::memset(row + m, kPad, max_len - m);
  *len_out = (int32_t)m;
}

inline void copy_id(const char* s, size_t n, char* dst, long stride) {
  // First whitespace-delimited token, truncated to stride-1.
  size_t m = 0;
  while (m < n && s[m] != ' ' && s[m] != '\t') ++m;
  if (m > (size_t)(stride - 1)) m = (size_t)(stride - 1);
  std::memcpy(dst, s, m);
  dst[m] = '\0';
}

}  // namespace

extern "C" {

void* pangea_fastx_open(const char* path) {
  gzFile f = gzopen(path, "rb");
  if (!f) return nullptr;
  gzbuffer(f, 1 << 20);
  Reader* r = new Reader();
  r->f = f;
  return r;
}

void pangea_fastx_close(void* h) {
  Reader* r = (Reader*)h;
  if (!r) return;
  if (r->f) gzclose(r->f);
  delete r;
}

const char* pangea_fastx_error(void* h) {
  Reader* r = (Reader*)h;
  return r ? r->err.c_str() : "null handle";
}

// Parse up to max_reads records into a padded batch.
//   codes: int8 [max_reads, max_len]  (row-padded with 4)
//   lens:  int32 [max_reads]          (post-truncation lengths)
//   quals: uint8 [max_reads, max_len] or NULL (phred+33 decoded, 0-padded)
//   ids:   char  [max_reads, id_stride] NUL-terminated first tokens
// Returns records parsed (0 = EOF), or -1 on malformed input / IO error.
long pangea_fastx_next_batch(void* h, long max_reads, long max_len,
                             int8_t* codes, int32_t* lens, uint8_t* quals,
                             char* ids, long id_stride) {
  Reader* r = (Reader*)h;
  if (!r || !r->peek_format()) return -1;
  long n = 0;
  size_t s, e;
  if (r->format == 2) {  // FASTQ
    while (n < max_reads) {
      if (!r->getline(&s, &e)) break;  // EOF
      if (e == s) continue;            // blank line tolerance
      if (r->buf[s] != '@') {
        r->err = "malformed FASTQ header";
        return -1;
      }
      copy_id(&r->buf[s + 1], e - s - 1, ids + n * id_stride, id_stride);
      size_t hs = s;
      if (!r->getline(&s, &e)) {
        r->err = "truncated FASTQ record";
        return -1;
      }
      (void)hs;
      // NOTE: getline may compact the buffer, so sequence bytes must be
      // consumed before the next getline call.
      encode_row(&r->buf[s], e - s, (size_t)max_len,
                 codes + n * max_len, lens + n);
      size_t seq_len = e - s;
      if (!r->getline(&s, &e) || r->buf[s] != '+') {
        r->err = "malformed FASTQ separator";
        return -1;
      }
      if (!r->getline(&s, &e)) {
        r->err = "truncated FASTQ quality";
        return -1;
      }
      if (e - s != seq_len) {
        r->err = "FASTQ qual/seq length mismatch";
        return -1;
      }
      if (quals) {
        uint8_t* q = quals + n * max_len;
        size_t m = seq_len < (size_t)max_len ? seq_len : (size_t)max_len;
        for (size_t i = 0; i < m; ++i)
          q[i] = (uint8_t)(r->buf[s + i] - 33);
        if (m < (size_t)max_len) std::memset(q + m, 0, max_len - m);
      }
      ++n;
    }
    return n;
  }
  // FASTA: sequences may span lines; accumulate until next '>' or EOF.
  std::string& seq = r->seq_scratch;
  while (n < max_reads) {
    if (!r->getline(&s, &e)) break;  // EOF
    if (e == s) continue;
    if (r->buf[s] != '>') {
      r->err = "malformed FASTA header";
      return -1;
    }
    // Copy header id now (buffer may compact during sequence reads).
    copy_id(&r->buf[s + 1], e - s - 1, ids + n * id_stride, id_stride);
    seq.clear();
    bool eof = false;
    for (;;) {
      if (!r->getline(&s, &e)) {
        eof = true;
        break;
      }
      if (e > s && r->buf[s] == '>') break;  // next record header
      seq.append(&r->buf[s], e - s);
    }
    encode_row(seq.data(), seq.size(), (size_t)max_len,
               codes + n * max_len, lens + n);
    if (quals)
      std::memset(quals + n * max_len, 0, max_len);
    ++n;
    if (eof) break;
    // The '>' line for the NEXT record is already consumed: rewind pos so
    // the next loop iteration re-reads it. Safe because getline never
    // compacts past a line it just returned.
    r->pos = s;
  }
  return n;
}

}  // extern "C"
