// Fast numeric CSV loader for CARLA log files.
//
// The framework's host-side data path reads hundreds of ~1500x55 numeric
// CSVs (DefensiveData/, SUT collected_data/).  This loader mmap-reads the
// file once and parses every field with std::from_chars — no per-field
// allocations, no type inference — and hands the result to Python as one
// contiguous double matrix (NaN for empty/non-numeric fields).
//
// C ABI (consumed by defensive_model_vae_tpu/data/csv_io.py via ctypes):
//   dmv_csv_open(path)        -> handle (NULL on failure)
//   dmv_csv_rows/cols(handle) -> dimensions
//   dmv_csv_header(handle)    -> comma-joined column names (owned by handle)
//   dmv_csv_copy(handle, out) -> row-major copy into caller buffer
//   dmv_csv_close(handle)
//
// Build: g++ -O2 -shared -fPIC -std=c++17 csvloader.cpp -o libdmvcsv.so

#include <cerrno>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct CsvTable {
  std::string header;       // comma-joined column names
  std::vector<double> data; // row-major, rows x cols
  int64_t rows = 0;
  int64_t cols = 0;
};

// Parse one field [begin, end) as double; NaN when empty or malformed.
inline double parse_field(const char *begin, const char *end) {
  while (begin < end && (*begin == ' ' || *begin == '\t'))
    ++begin;
  while (end > begin && (end[-1] == ' ' || end[-1] == '\t' || end[-1] == '\r'))
    --end;
  if (begin == end)
    return std::nan("");
  // from_chars rejects a leading '+' that pandas (the fallback parser)
  // accepts — skip it so both paths parse '+1.5'-style fields identically.
  // '+inf' also matches pandas; '+nan' does NOT (pandas leaves the column
  // as object strings), so that token remains a residual divergence —
  // noted in the native-parity test
  if (*begin == '+' && end - begin > 1 &&
      ((begin[1] >= '0' && begin[1] <= '9') || begin[1] == '.' ||
       begin[1] == 'i' || begin[1] == 'I' || begin[1] == 'n' ||
       begin[1] == 'N'))
    ++begin;
  double value;
  auto res = std::from_chars(begin, end, value);
  if (res.ec != std::errc() || res.ptr != end)
    return std::nan("");
  return value;
}

} // namespace

extern "C" {

void *dmv_csv_open(const char *path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0)
    return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    ::close(fd);
    return nullptr;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char *buf =
      static_cast<const char *>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  ::close(fd);
  if (buf == MAP_FAILED)
    return nullptr;

  auto *table = new CsvTable();
  const char *p = buf;
  const char *file_end = buf + size;

  // header line
  const char *line_end = static_cast<const char *>(memchr(p, '\n', file_end - p));
  if (!line_end)
    line_end = file_end;
  table->header.assign(p, line_end);
  while (!table->header.empty() &&
         (table->header.back() == '\r' || table->header.back() == ' '))
    table->header.pop_back();
  table->cols = 1;
  for (char c : table->header)
    if (c == ',')
      ++table->cols;
  p = line_end < file_end ? line_end + 1 : file_end;

  // data rows
  table->data.reserve((size / 8) + 64);
  while (p < file_end) {
    line_end = static_cast<const char *>(memchr(p, '\n', file_end - p));
    if (!line_end)
      line_end = file_end;
    if (line_end > p && !(line_end - p == 1 && *p == '\r')) {
      int64_t field_count = 0;
      const char *field_start = p;
      for (const char *q = p; q <= line_end; ++q) {
        if (q == line_end || *q == ',') {
          table->data.push_back(parse_field(field_start, q));
          ++field_count;
          field_start = q + 1;
        }
      }
      // short row: NaN-pad to the header width (pandas pads too)
      for (; field_count < table->cols; ++field_count)
        table->data.push_back(std::nan(""));
      // over-wide row: ambiguous (pandas promotes the first field to an
      // index) — fail the whole parse so the pandas fallback's
      // interpretation governs instead of a silent tail-trim
      if (field_count > table->cols) {
        delete table;
        munmap(const_cast<char *>(buf), size);
        return nullptr;
      }
      ++table->rows;
    }
    p = line_end < file_end ? line_end + 1 : file_end;
  }

  munmap(const_cast<char *>(buf), size);
  return table;
}

int64_t dmv_csv_rows(void *handle) {
  return handle ? static_cast<CsvTable *>(handle)->rows : -1;
}

int64_t dmv_csv_cols(void *handle) {
  return handle ? static_cast<CsvTable *>(handle)->cols : -1;
}

const char *dmv_csv_header(void *handle) {
  return handle ? static_cast<CsvTable *>(handle)->header.c_str() : nullptr;
}

void dmv_csv_copy(void *handle, double *out) {
  if (!handle || !out)
    return;
  auto *table = static_cast<CsvTable *>(handle);
  memcpy(out, table->data.data(), table->data.size() * sizeof(double));
}

void dmv_csv_close(void *handle) { delete static_cast<CsvTable *>(handle); }

} // extern "C"
