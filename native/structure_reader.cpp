// Fast STRUCTURE-format tokenizer for multiclust-tpu.
//
// The reference parses with per-character fgetc/fscanf loops
// (read_file.c:169-238) - fine for its era, but a 100k x 500k biobank
// STRUCTURE file is ~100 GB of text where parsing dominates end-to-end
// time.  This reader slurps the file, tokenizes in place, and emits:
//   * the numeric genotype matrix as int64 [n_rows, n_cols]
//   * a NUL-separated blob of the two leading info tokens per row
//     (name, locale), decoded lazily on the Python side
// Layout interpretation (interleave detection, ploidy reshaping, missing
// remap) stays in Python where it is cheap.  C ABI + ctypes - no pybind11.
//
// Build: make -C native   (produces _structure_reader.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

struct McParse {
  int64_t n_rows;        // data rows (excl. header / distance line)
  int64_t n_cols;        // numeric columns per data row
  int64_t header_cols;   // tokens on the header line
  int32_t skipped_distances;  // a "-1 ..." second line was skipped
  int32_t error;         // nonzero on failure
  char err_msg[256];
  int64_t* data;         // [n_rows * n_cols]
  char* blob;            // name\0locale\0 per row
  int64_t blob_len;
};

static void fail(McParse* p, const char* msg) {
  p->error = 1;
  snprintf(p->err_msg, sizeof(p->err_msg), "%s", msg);
}

McParse* mc_parse_structure(const char* path) {
  McParse* p = (McParse*)calloc(1, sizeof(McParse));
  if (!p) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) { fail(p, "cannot open file"); return p; }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc(size + 1);
  if (!buf) { fclose(f); fail(p, "out of memory"); return p; }
  if (fread(buf, 1, size, f) != (size_t)size) {
    fclose(f); free(buf); fail(p, "short read"); return p;
  }
  fclose(f);
  buf[size] = '\0';

  std::vector<int64_t> data;
  std::string blob;
  data.reserve(1 << 20);
  blob.reserve(1 << 16);

  char* cur = buf;
  char* end = buf + size;
  bool header_done = false;
  bool first_data_row = true;
  int64_t n_cols = -1;

  while (cur < end) {
    // find line bounds
    char* line = cur;
    char* nl = (char*)memchr(cur, '\n', end - cur);
    char* line_end = nl ? nl : end;
    cur = nl ? nl + 1 : end;

    // tokenize line in place
    char* t = line;
    int tok_idx = 0;
    bool row_has_data = false;
    int64_t row_cols = 0;
    char* name_tok = nullptr; size_t name_len = 0;
    char* loc_tok = nullptr; size_t loc_len = 0;
    bool skip_row = false;

    while (t < line_end) {
      while (t < line_end && (*t == ' ' || *t == '\t' || *t == '\r')) ++t;
      if (t >= line_end) break;
      char* tok = t;
      while (t < line_end && *t != ' ' && *t != '\t' && *t != '\r') ++t;
      size_t len = t - tok;

      if (!header_done) {
        ++row_cols;  // counting header tokens
        row_has_data = true;
        continue;
      }
      if (tok_idx == 0 && first_data_row && len == 2 &&
          tok[0] == '-' && tok[1] == '1') {
        // inter-marker distance line (read_file.c:70-82)
        p->skipped_distances = 1;
        skip_row = true;
        break;
      }
      if (tok_idx == 0) { name_tok = tok; name_len = len; }
      else if (tok_idx == 1) { loc_tok = tok; loc_len = len; }
      else {
        // fast integer parse (alleles are integers, read_file.c:32)
        int64_t v = 0; bool neg = false; char* q = tok;
        if (*q == '-') { neg = true; ++q; }
        if (q == tok + len) {
          free(buf); fail(p, "non-integer allele token"); return p;
        }
        for (; q < tok + len; ++q) {
          if (*q < '0' || *q > '9') {
            free(buf); fail(p, "non-integer allele token"); return p;
          }
          v = v * 10 + (*q - '0');
        }
        data.push_back(neg ? -v : v);
        ++row_cols;
      }
      ++tok_idx;
      row_has_data = true;
    }

    if (!row_has_data) continue;       // blank line
    if (!header_done) {
      p->header_cols = row_cols;
      header_done = true;
      continue;
    }
    if (skip_row) continue;
    first_data_row = false;
    if (tok_idx < 2) { free(buf); fail(p, "row with fewer than 2 info columns"); return p; }
    if (n_cols < 0) n_cols = row_cols;
    else if (row_cols != n_cols) {
      free(buf); fail(p, "ragged data rows"); return p;
    }
    blob.append(name_tok, name_len); blob.push_back('\0');
    blob.append(loc_tok, loc_len); blob.push_back('\0');
    p->n_rows += 1;
  }
  free(buf);

  p->n_cols = n_cols < 0 ? 0 : n_cols;
  p->data = (int64_t*)malloc(data.size() * sizeof(int64_t));
  if (!p->data && !data.empty()) { fail(p, "out of memory"); return p; }
  memcpy(p->data, data.data(), data.size() * sizeof(int64_t));
  p->blob_len = (int64_t)blob.size();
  p->blob = (char*)malloc(blob.size());
  if (!p->blob && !blob.empty()) { fail(p, "out of memory"); return p; }
  memcpy(p->blob, blob.data(), blob.size());
  return p;
}

void mc_free(McParse* p) {
  if (!p) return;
  free(p->data);
  free(p->blob);
  free(p);
}

}  // extern "C"
