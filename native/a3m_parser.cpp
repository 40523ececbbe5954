// Fast A3M/FASTA multiple-sequence-alignment parser.
//
// Native data-loader component of rosettafold_tpu (the reference has no data
// pipeline at all; its only native deps are DGL/ATen kernels - SURVEY.md §2.6).
// Parses A3M: '>' header lines start a new sequence; lowercase letters are
// insertions relative to the query and are dropped; '.' is dropped; every
// remaining character is mapped through a 256-entry token table (20 canonical
// amino acids + gap=20, matching rosettafold_tpu.data.vocab).
//
// Exposed as a C ABI for ctypes:
//   int a3m_parse(const char* path, int8_t* out, int max_seqs, int max_len,
//                 int* n_seqs_out, int* seq_len_out)
// Returns 0 on success; out is row-major (n_seqs, seq_len). Sequences longer /
// shorter than the query are rejected (return 3). Build:
//   g++ -O3 -shared -fPIC -o liba3m.so a3m_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int8_t GAP = 20;

struct TokenTable {
  int8_t t[256];
  TokenTable() {
    for (int i = 0; i < 256; ++i) t[i] = GAP;
    const char* order = "ARNDCQEGHILKMFPSTWYV";
    for (int i = 0; i < 20; ++i) t[(unsigned char)order[i]] = (int8_t)i;
    t[(unsigned char)'B'] = 3;   // -> D
    t[(unsigned char)'Z'] = 6;   // -> E
    t[(unsigned char)'J'] = 10;  // -> L
    t[(unsigned char)'U'] = 4;   // -> C
    t[(unsigned char)'O'] = 11;  // -> K
  }
};

const TokenTable kTable;

inline bool is_insertion(unsigned char c) { return (c >= 'a' && c <= 'z') || c == '.'; }

}  // namespace

extern "C" {

// Returns: 0 ok, 1 io error, 2 empty, 3 ragged alignment.
int a3m_parse(const char* path, int8_t* out, int max_seqs, int max_len,
              int* n_seqs_out, int* seq_len_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (size > 0 && std::fread(&buf[0], 1, size, f) != (size_t)size) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);

  int n_seqs = 0;
  int seq_len = -1;
  int col = 0;
  bool in_seq = false;
  bool skipping_rest = false;  // past max_seqs: parse but do not store

  const char* p = buf.data();
  const char* end = p + buf.size();
  while (p < end) {
    // one line
    const char* nl = (const char*)memchr(p, '\n', end - p);
    size_t len = nl ? (size_t)(nl - p) : (size_t)(end - p);
    if (len > 0 && p[0] == '>') {
      // close previous sequence
      if (in_seq && !skipping_rest) {
        if (seq_len < 0) seq_len = col;
        else if (col != seq_len) return 3;
        ++n_seqs;
      }
      col = 0;
      in_seq = true;
      skipping_rest = (n_seqs >= max_seqs);
    } else if (in_seq && !skipping_rest) {
      for (size_t i = 0; i < len; ++i) {
        unsigned char c = (unsigned char)p[i];
        if (c == '\r' || c == ' ' || c == '\t') continue;
        if (is_insertion(c)) continue;  // lowercase insertion / '.'
        if (col >= max_len) return 3;
        out[(long)n_seqs * max_len + col] = kTable.t[c];
        ++col;
      }
    }
    p = nl ? nl + 1 : end;
  }
  if (in_seq && !skipping_rest) {
    if (seq_len < 0) seq_len = col;
    else if (col != seq_len) return 3;
    ++n_seqs;
  }
  if (n_seqs == 0 || seq_len <= 0) return 2;
  *n_seqs_out = n_seqs;
  *seq_len_out = seq_len;
  return 0;
}

}  // extern "C"
