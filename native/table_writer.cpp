// Fast numeric-table writer for multiclust-tpu output files.
//
// The reference emits its per-K estimate files with per-value fprintf
// loops (write_file_detail, write_file.c:203-335).  At biobank scale the
// .pklm table is K * sum_l M_l ~ 20M rows and the engine REWRITES the
// best-so-far files every time an initialization improves the maximum
// (multiclust.c:584-600) - a pure-Python formatting loop costs ~a minute
// per rewrite, the snprintf loop here ~2 s, with byte-identical output
// ("%d"/"%f" semantics are shared with Python's % operator).
//
// C ABI + ctypes (no pybind11): one call writes header + table + trailer.
//   ints   row-major [n_rows, n_int]  int64  - leading tab-separated cols
//   floats row-major [n_rows, n_f]    double - trailing "%f" cols
// Row format: "<i0>\t<i1>...\t<f0>\t<f1>...\n".
//
// Build: make -C native   (produces _table_writer.so)

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Returns 0 on success, nonzero on IO failure.
int mc_write_table(const char* path, const char* header,
                   const char* trailer, int64_t n_rows, int32_t n_int,
                   const int64_t* ints, int32_t n_f,
                   const double* floats) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return 1;
  static const size_t BUF = 1 << 20;
  char* buf = new char[BUF + 4096];
  size_t used = 0;
  int rc = 0;

  if (header && *header) {
    if (fwrite(header, 1, strlen(header), fp) != strlen(header)) rc = 2;
  }
  for (int64_t r = 0; r < n_rows && rc == 0; ++r) {
    char* w = buf + used;
    for (int32_t c = 0; c < n_int; ++c) {
      if (c) *w++ = '\t';
      w += snprintf(w, 32, "%lld",
                    (long long)ints[r * n_int + c]);
    }
    for (int32_t c = 0; c < n_f; ++c) {
      if (c || n_int) *w++ = '\t';
      w += snprintf(w, 40, "%f", floats[r * n_f + c]);
    }
    *w++ = '\n';
    used = (size_t)(w - buf);
    if (used >= BUF) {
      if (fwrite(buf, 1, used, fp) != used) rc = 2;
      used = 0;
    }
  }
  if (rc == 0 && used) {
    if (fwrite(buf, 1, used, fp) != used) rc = 2;
  }
  if (rc == 0 && trailer && *trailer) {
    if (fwrite(trailer, 1, strlen(trailer), fp) != strlen(trailer))
      rc = 2;
  }
  delete[] buf;
  if (fclose(fp) != 0) rc = 3;
  return rc;
}

}  // extern "C"
