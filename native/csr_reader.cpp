// csr_reader: native ABACUS sparse-matrix (H(R)/S(R) CSR text) parser.
//
// TPU-framework counterpart of the reference's native abacus_postprocess
// layer (stripped from the snapshot; the Python fallback is
// /root/reference/DFT_interfaces/abacus/read_abacus.py:418-580 `ABACUSHS`).
// The ABACUS `data-HR-sparse_SPIN0.csr` / `data-SR-sparse_SPIN0.csr` files
// are plain text:
//
//   [STEP: n]
//   Matrix Dimension of ...: <no_u>
//   Matrix number of ...: <ncell_shift>
//   <sx> <sy> <sz> <nnz>          # per cell shift, nnz may be 0 (no rows)
//   <val ...>                     # nnz floats, or nnz "(re,im)" pairs (SOC)
//   <col ...>                     # nnz ints
//   <row ...>                     # no_u+1 ints (CSR indptr)
//
// Output is a compact little-endian binary container ("ABCSR1"):
//   magic[8]="ABCSR1\0\0", int64 no_u, int64 is_complex, int64 n_blocks,
//   then per block: int64 shift[3], int64 nnz,
//     float64 vals[nnz * (2 if complex else 1)]  (interleaved re,im),
//     int64 col[nnz], int64 row[no_u+1].
// Read on the Python side by hamgnn_tpu.interfaces.abacus.read_csr_native.
// Binary (not JSON) because production HR files reach hundreds of MB and
// this parse is the data-prep bottleneck.
//
// Usage: csr_reader <in.csr> <out.bin> [--soc]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

void die(const char* msg) {
  std::fprintf(stderr, "csr_reader: %s\n", msg);
  std::exit(1);
}

// Extract all numeric tokens from a line, accepting "1.5", "-2e-3" and the
// SOC tuple form "(re,im)" (read_abacus.py:549 uses the same tolerant scan).
std::vector<double> numbers(const std::string& line) {
  std::vector<double> out;
  const char* p = line.c_str();
  const char* end = p + line.size();
  while (p < end) {
    if ((*p >= '0' && *p <= '9') || *p == '-' || *p == '+' || *p == '.') {
      char* next = nullptr;
      double v = std::strtod(p, &next);
      if (next == p) {
        ++p;
        continue;
      }
      out.push_back(v);
      p = next;
    } else {
      ++p;
    }
  }
  return out;
}

std::vector<int64_t> integers(const std::string& line) {
  std::vector<int64_t> out;
  std::istringstream ss(line);
  long long v;
  while (ss >> v) out.push_back(v);
  return out;
}

template <typename T>
void put(std::ofstream& f, const T* data, size_t n) {
  f.write(reinterpret_cast<const char*>(data), n * sizeof(T));
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: csr_reader <in.csr> <out.bin> [--soc]\n");
    return 2;
  }
  const bool soc = argc >= 4 && std::strcmp(argv[3], "--soc") == 0;

  std::ifstream in(argv[1]);
  if (!in) die("cannot open input");
  std::string line;
  if (!std::getline(in, line)) die("empty file");
  if (line.find("STEP") != std::string::npos)
    if (!std::getline(in, line)) die("truncated header");
  // "Matrix Dimension of H(R): N" — take the last whitespace token,
  // matching read_abacus.py:448 `line.split()[-1]`.
  std::istringstream hs(line);
  std::string tok, last;
  while (hs >> tok) last = tok;
  char* endp = nullptr;
  const int64_t no_u = std::strtoll(last.c_str(), &endp, 10);
  if (last.empty() || endp == last.c_str()) die("cannot parse matrix dimension");
  if (!std::getline(in, line)) die("missing ncell line");

  struct Block {
    int64_t shift[3];
    std::vector<double> vals;  // re or interleaved (re, im)
    std::vector<int64_t> col, row;
  };
  std::vector<Block> blocks;

  while (std::getline(in, line)) {
    auto t = integers(line);
    if (t.size() < 4) continue;  // blank / malformed separator lines
    const int64_t nnz = t[3];
    if (nnz == 0) continue;
    Block b;
    b.shift[0] = t[0];
    b.shift[1] = t[1];
    b.shift[2] = t[2];
    std::string vline, cline, rline;
    if (!std::getline(in, vline) || !std::getline(in, cline) ||
        !std::getline(in, rline))
      die("truncated block");
    b.vals = numbers(vline);
    const size_t want = static_cast<size_t>(nnz) * (soc ? 2 : 1);
    if (b.vals.size() != want) die("value count mismatch");
    b.col = integers(cline);
    if (b.col.size() != static_cast<size_t>(nnz)) die("col count mismatch");
    b.row = integers(rline);
    if (b.row.size() != static_cast<size_t>(no_u) + 1)
      die("row-ptr count mismatch");
    blocks.push_back(std::move(b));
  }

  std::ofstream out(argv[2], std::ios::binary);
  if (!out) die("cannot open output");
  const char magic[8] = {'A', 'B', 'C', 'S', 'R', '1', 0, 0};
  out.write(magic, 8);
  const int64_t is_complex = soc ? 1 : 0;
  const int64_t n_blocks = static_cast<int64_t>(blocks.size());
  put(out, &no_u, 1);
  put(out, &is_complex, 1);
  put(out, &n_blocks, 1);
  for (const auto& b : blocks) {
    put(out, b.shift, 3);
    const int64_t nnz = static_cast<int64_t>(b.col.size());
    put(out, &nnz, 1);
    put(out, b.vals.data(), b.vals.size());
    put(out, b.col.data(), b.col.size());
    put(out, b.row.data(), b.row.size());
  }
  return 0;
}
