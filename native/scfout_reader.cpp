// scfout_reader: native OpenMX SCFOUT v3 parser -> HS.json
//
// TPU-framework equivalent of the reference's read_openmx.c
// (/root/reference/DFT_interfaces/openmx/openmx_postprocess/read_openmx.c):
// same binary layout (header, periodic-image tables, per-atom orbital and
// neighbor tables, Hks[spin], iHks for SOC, OLP, postprocess extensions
// D_OLP / OLP_L, DM/iDM, trailer) and the same HS.json key contract
// (edge_index, pos, cell_shift, inv_edge_idx, nbr_shift, Hon/Hoff,
// iHon/iHoff, Son/Soff, Lon/Loff).
//
// Improvements over the reference implementation:
//   * whole-file mmap-style buffered read instead of per-row fread;
//   * O(E) hash-map inverse-edge search instead of the O(E^2) scan
//     (read_openmx.c:938-995);
//   * bounds-checked parsing with clear error messages.
//
// Usage: scfout_reader <file.scfout> [out.json] [--standard]
//   --standard: plain OpenMX 3.9 layout without the D_OLP/OLP_L sections.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Reader {
  std::vector<char> buf;
  size_t ofs = 0;
  bool swap = false;

  void need(size_t n) const {
    if (ofs + n > buf.size()) {
      std::fprintf(stderr, "scfout_reader: truncated file (need %zu at %zu)\n",
                   n, ofs);
      std::exit(1);
    }
  }
  template <typename T> T one() {
    need(sizeof(T));
    T v;
    std::memcpy(&v, buf.data() + ofs, sizeof(T));
    ofs += sizeof(T);
    if (swap) {
      char* p = reinterpret_cast<char*>(&v);
      for (size_t b = 0; b < sizeof(T) / 2; ++b) std::swap(p[b], p[sizeof(T) - 1 - b]);
    }
    return v;
  }
  std::vector<int32_t> ints(size_t n) {
    std::vector<int32_t> out(n);
    for (size_t i = 0; i < n; ++i) out[i] = one<int32_t>();
    return out;
  }
  std::vector<double> doubles(size_t n) {
    std::vector<double> out(n);
    for (size_t i = 0; i < n; ++i) out[i] = one<double>();
    return out;
  }
};

struct PairBlocks {
  // flat storage: per (atom, h) block of size no1*no2*(vec)
  std::vector<std::vector<double>> on;    // h == 0
  std::vector<std::vector<double>> off;   // h >= 1, edge order
};

struct EdgeKey {
  int32_t a, b, sx, sy, sz;
  bool operator==(const EdgeKey& o) const {
    return a == o.a && b == o.b && sx == o.sx && sy == o.sy && sz == o.sz;
  }
};
struct EdgeKeyHash {
  size_t operator()(const EdgeKey& k) const {
    size_t h = std::hash<int64_t>()((int64_t)k.a << 32 | (uint32_t)k.b);
    h ^= std::hash<int64_t>()(((int64_t)(k.sx + 512) << 40) |
                              ((int64_t)(k.sy + 512) << 20) | (k.sz + 512)) + 0x9e3779b9 + (h << 6);
    return h;
  }
};

void print_rows(std::FILE* f, const std::vector<std::vector<double>>& rows) {
  for (size_t n = 0; n < rows.size(); ++n) {
    std::fputc('[', f);
    const auto& r = rows[n];
    for (size_t i = 0; i < r.size(); ++i)
      std::fprintf(f, i + 1 < r.size() ? "%14.10f," : "%14.10f", r[i]);
    std::fputc(']', f);
    if (n + 1 < rows.size()) std::fputc(',', f);
  }
}

void print_rows_vec3(std::FILE* f, const std::vector<std::vector<double>>& rows) {
  for (size_t n = 0; n < rows.size(); ++n) {
    std::fputc('[', f);
    const auto& r = rows[n];
    size_t m = r.size() / 3;
    for (size_t i = 0; i < m; ++i)
      std::fprintf(f, i + 1 < m ? "[%10.7f,%10.7f,%10.7f]," : "[%10.7f,%10.7f,%10.7f]",
                   r[3 * i], r[3 * i + 1], r[3 * i + 2]);
    std::fputc(']', f);
    if (n + 1 < rows.size()) std::fputc(',', f);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: scfout_reader <file.scfout> [out.json] [--standard]\n");
    return 2;
  }
  const char* path = argv[1];
  std::string out_path = "HS.json";
  bool postprocess_ext = true;
  for (int i = 2; i < argc; ++i) {
    if (std::string(argv[i]) == "--standard") postprocess_ext = false;
    else out_path = argv[i];
  }

  Reader r;
  {
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path); return 1; }
    size_t size = (size_t)f.tellg();
    f.seekg(0);
    r.buf.resize(size);
    f.read(r.buf.data(), (std::streamsize)size);
  }

  auto head = r.ints(6);
  if (head[1] < 0 || head[1] > 15) {  // endianness heuristic (read_openmx.c:109)
    r.swap = true;
    r.ofs = 0;
    head = r.ints(6);
    if (head[1] < 0 || head[1] > 15) {
      std::fprintf(stderr, "endianness mismatch\n");
      return 1;
    }
  }
  const int atomnum = head[0];
  const int spinp = head[1] % 4;
  const int version = head[1] / 4;
  const int tcpycell = head[5];
  if (version != 3) {
    std::fprintf(stderr, "unsupported scfout version %d (need 3)\n", version);
    return 1;
  }

  r.ints(1);  // order_max
  std::vector<double> atv((size_t)(tcpycell + 1) * 4);
  for (auto& v : atv) v = r.one<double>();
  std::vector<int32_t> atv_ijk((size_t)(tcpycell + 1) * 4);
  for (auto& v : atv_ijk) v = r.one<int32_t>();

  auto num_orbs = r.ints(atomnum);
  auto fnan = r.ints(atomnum);
  std::vector<std::vector<int32_t>> natn(atomnum), ncn(atomnum);
  for (int a = 0; a < atomnum; ++a) natn[a] = r.ints((size_t)fnan[a] + 1);
  for (int a = 0; a < atomnum; ++a) ncn[a] = r.ints((size_t)fnan[a] + 1);
  r.doubles(12);  // tv
  r.doubles(12);  // rtv
  std::vector<double> pos((size_t)atomnum * 3);
  for (int a = 0; a < atomnum; ++a) {
    auto g = r.doubles(4);
    pos[3 * a] = g[1]; pos[3 * a + 1] = g[2]; pos[3 * a + 2] = g[3];
  }

  auto read_pair_blocks = [&](int vec) {
    PairBlocks out;
    for (int a = 0; a < atomnum; ++a) {
      int no1 = num_orbs[a];
      for (int h = 0; h <= fnan[a]; ++h) {
        int gh = natn[a][h] - 1;
        int no2 = num_orbs[gh];
        auto blk = r.doubles((size_t)no1 * no2 * vec);
        (h == 0 ? out.on : out.off).push_back(std::move(blk));
      }
    }
    return out;
  };

  std::vector<PairBlocks> hks;
  for (int s = 0; s <= spinp; ++s) hks.push_back(read_pair_blocks(1));
  std::vector<PairBlocks> ihks;
  if (spinp == 3)
    for (int s = 0; s < 3; ++s) ihks.push_back(read_pair_blocks(1));
  PairBlocks olp = read_pair_blocks(1);
  PairBlocks olp_l;
  if (postprocess_ext) {
    read_pair_blocks(3);          // D_OLP (overlap derivatives), not exported
    olp_l = read_pair_blocks(3);  // OLP_L angular-momentum matrices
  }
  // DM / iDM / trailer are not needed for HS.json; stop reading here.

  // edge tables
  std::vector<int32_t> esrc, edst, eshift;
  std::vector<double> enshift;
  for (int a = 0; a < atomnum; ++a)
    for (int h = 1; h <= fnan[a]; ++h) {
      esrc.push_back(a);
      edst.push_back(natn[a][h] - 1);
      int rn = ncn[a][h];
      eshift.push_back(atv_ijk[4 * rn + 1]);
      eshift.push_back(atv_ijk[4 * rn + 2]);
      eshift.push_back(atv_ijk[4 * rn + 3]);
      enshift.push_back(atv[4 * rn + 1]);
      enshift.push_back(atv[4 * rn + 2]);
      enshift.push_back(atv[4 * rn + 3]);
    }
  const size_t E = esrc.size();

  // O(E) inverse-edge map (replaces read_openmx.c's O(E^2) scan)
  std::unordered_map<EdgeKey, int32_t, EdgeKeyHash> emap;
  emap.reserve(E * 2);
  for (size_t e = 0; e < E; ++e)
    emap[{esrc[e], edst[e], eshift[3 * e], eshift[3 * e + 1], eshift[3 * e + 2]}] = (int32_t)e;
  std::vector<int32_t> inv(E);
  for (size_t e = 0; e < E; ++e) {
    auto it = emap.find({edst[e], esrc[e], -eshift[3 * e], -eshift[3 * e + 1], -eshift[3 * e + 2]});
    if (it == emap.end()) {
      std::fprintf(stderr, "edge %zu has no inverse\n", e);
      return 1;
    }
    inv[e] = it->second;
  }

  std::FILE* f = std::fopen(out_path.c_str(), "w");
  if (!f) { std::fprintf(stderr, "cannot write %s\n", out_path.c_str()); return 1; }
  std::fprintf(f, "{\n\"edge_index\": [[");
  for (size_t e = 0; e < E; ++e) std::fprintf(f, e ? ",%d" : "%d", esrc[e]);
  std::fprintf(f, "],[");
  for (size_t e = 0; e < E; ++e) std::fprintf(f, e ? ",%d" : "%d", edst[e]);
  std::fprintf(f, "]],\n\"pos\": [");
  for (int a = 0; a < atomnum; ++a)
    std::fprintf(f, a ? ",[%10.7f,%10.7f,%10.7f]" : "[%10.7f,%10.7f,%10.7f]",
                 pos[3 * a], pos[3 * a + 1], pos[3 * a + 2]);
  std::fprintf(f, "],\n\"cell_shift\": [");
  for (size_t e = 0; e < E; ++e)
    std::fprintf(f, e ? ",[%d,%d,%d]" : "[%d,%d,%d]", eshift[3 * e], eshift[3 * e + 1], eshift[3 * e + 2]);
  std::fprintf(f, "],\n\"inv_edge_idx\": [");
  for (size_t e = 0; e < E; ++e) std::fprintf(f, e ? ",%d" : "%d", inv[e]);
  std::fprintf(f, "],\n\"nbr_shift\": [");
  for (size_t e = 0; e < E; ++e)
    std::fprintf(f, e ? ",[%10.7f,%10.7f,%10.7f]" : "[%10.7f,%10.7f,%10.7f]",
                 enshift[3 * e], enshift[3 * e + 1], enshift[3 * e + 2]);

  std::fprintf(f, "],\n\"Hon\": [");
  for (size_t s = 0; s < hks.size(); ++s) {
    std::fputc('[', f);
    print_rows(f, hks[s].on);
    std::fputc(']', f);
    if (s + 1 < hks.size()) std::fputc(',', f);
  }
  std::fprintf(f, "],\n\"Hoff\": [");
  for (size_t s = 0; s < hks.size(); ++s) {
    std::fputc('[', f);
    print_rows(f, hks[s].off);
    std::fputc(']', f);
    if (s + 1 < hks.size()) std::fputc(',', f);
  }
  if (!ihks.empty()) {
    std::fprintf(f, "],\n\"iHon\": [");
    for (size_t s = 0; s < ihks.size(); ++s) {
      std::fputc('[', f);
      print_rows(f, ihks[s].on);
      std::fputc(']', f);
      if (s + 1 < ihks.size()) std::fputc(',', f);
    }
    std::fprintf(f, "],\n\"iHoff\": [");
    for (size_t s = 0; s < ihks.size(); ++s) {
      std::fputc('[', f);
      print_rows(f, ihks[s].off);
      std::fputc(']', f);
      if (s + 1 < ihks.size()) std::fputc(',', f);
    }
  }
  std::fprintf(f, "],\n\"Son\": [");
  print_rows(f, olp.on);
  std::fprintf(f, "],\n\"Soff\": [");
  print_rows(f, olp.off);
  if (postprocess_ext) {
    std::fprintf(f, "],\n\"Lon\": [");
    print_rows_vec3(f, olp_l.on);
    std::fprintf(f, "],\n\"Loff\": [");
    print_rows_vec3(f, olp_l.off);
  }
  std::fprintf(f, "]\n}\n");
  std::fclose(f);
  return 0;
}
