// hsx_reader: native SIESTA/HONPAS .HSX parser -> JSON
//
// TPU-framework equivalent of the reference's native Fortran dumper
// (/root/reference/DFT_interfaces/siesta/hsx4.1.5/hsx_m.f90:95-231 +
// dump.f90), which converts the Fortran sequential-unformatted .HSX file
// into a stream consumed by read_siesta.py.  Here the parse goes straight
// to JSON with the same field contract as hamgnn_tpu.interfaces.siesta
// .HSXData (no_u, no_s, nspin, indxuo, numh, listh, hamilt [Hartree],
// sover, xij [Bohr], species_no, zval, isa, iaorb); the Python side
// (parse_hsx_native) reconstructs HSXData and the graph builder is shared
// with the pure-numpy parser, which doubles as a cross-check.
//
// Record layout parsed (hsx_m.f90 write order):
//   (no_u, no_s, nspin, nh); (gamma); [indxuo if not gamma]; numh(no_u);
//   listh per row; H per (spin,row) float32 in Ry; S per row float32;
//   (qtot, temp) float64; xij per row (3*numh float32, Bohr); nspecies;
//   one record of (label char*20, zval float64, no int32) * nspecies;
//   (nquant, lquant, zeta) per species orbital; na_u; isa(na_u);
//   (iaorb, iphorb) interleaved.
//
// Usage: hsx_reader <file.HSX> [out.json]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace {

// Ry -> Hartree, matching interfaces/siesta.py:31 exactly.
const double RY2HA = 13.60580 / 27.21138506;

struct FortranReader {
  std::vector<char> buf;
  size_t ofs = 0;

  explicit FortranReader(const char* path) {
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f) {
      std::fprintf(stderr, "hsx_reader: cannot open %s\n", path);
      std::exit(1);
    }
    std::streamsize n = f.tellg();
    f.seekg(0);
    buf.resize(static_cast<size_t>(n));
    f.read(buf.data(), n);
  }

  void need(size_t n) const {
    if (ofs + n > buf.size()) {
      std::fprintf(stderr, "hsx_reader: truncated file (need %zu at %zu)\n", n,
                   ofs);
      std::exit(1);
    }
  }

  // One sequential-unformatted record (4-byte little-endian length markers).
  std::vector<char> record() {
    need(4);
    int32_t len;
    std::memcpy(&len, buf.data() + ofs, 4);
    ofs += 4;
    if (len < 0) {
      std::fprintf(stderr, "hsx_reader: negative record length at %zu\n", ofs);
      std::exit(1);
    }
    need(static_cast<size_t>(len) + 4);
    std::vector<char> out(buf.begin() + ofs, buf.begin() + ofs + len);
    ofs += len;
    int32_t len2;
    std::memcpy(&len2, buf.data() + ofs, 4);
    ofs += 4;
    if (len2 != len) {
      std::fprintf(stderr, "hsx_reader: corrupt record markers (%d vs %d)\n",
                   len, len2);
      std::exit(1);
    }
    return out;
  }

  std::vector<int32_t> ints() {
    auto rec = record();
    std::vector<int32_t> out(rec.size() / 4);
    std::memcpy(out.data(), rec.data(), out.size() * 4);
    return out;
  }

  std::vector<float> floats() {
    auto rec = record();
    std::vector<float> out(rec.size() / 4);
    std::memcpy(out.data(), rec.data(), out.size() * 4);
    return out;
  }
};

struct JsonWriter {
  FILE* f;
  bool first_key = true;

  explicit JsonWriter(FILE* fh) : f(fh) { std::fputc('{', f); }
  void finish() {
    std::fputs("}\n", f);
  }
  void key(const char* k) {
    if (!first_key) std::fputc(',', f);
    first_key = false;
    std::fprintf(f, "\"%s\":", k);
  }
  void scalar(const char* k, long long v) {
    key(k);
    std::fprintf(f, "%lld", v);
  }
  void arr_int(const char* k, const std::vector<int64_t>& v) {
    key(k);
    std::fputc('[', f);
    for (size_t i = 0; i < v.size(); ++i)
      std::fprintf(f, i ? ",%lld" : "%lld", static_cast<long long>(v[i]));
    std::fputc(']', f);
  }
  void arr_dbl(const char* k, const std::vector<double>& v) {
    key(k);
    std::fputc('[', f);
    for (size_t i = 0; i < v.size(); ++i)
      std::fprintf(f, i ? ",%.17g" : "%.17g", v[i]);
    std::fputc(']', f);
  }
  void arr_dbl2(const char* k, const std::vector<std::vector<double>>& v) {
    key(k);
    std::fputc('[', f);
    for (size_t i = 0; i < v.size(); ++i) {
      if (i) std::fputc(',', f);
      std::fputc('[', f);
      for (size_t j = 0; j < v[i].size(); ++j)
        std::fprintf(f, j ? ",%.17g" : "%.17g", v[i][j]);
      std::fputc(']', f);
    }
    std::fputc(']', f);
  }
};

std::vector<int64_t> widen(const std::vector<int32_t>& v) {
  return std::vector<int64_t>(v.begin(), v.end());
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: hsx_reader <file.HSX> [out.json]\n");
    return 2;
  }
  FortranReader r(argv[1]);

  auto head = r.ints();
  if (head.size() != 4) {
    std::fprintf(stderr, "hsx_reader: bad header record (%zu ints)\n",
                 head.size());
    return 1;
  }
  const int64_t no_u = head[0], no_s = head[1], nspin = head[2], nh = head[3];
  const bool gamma = r.ints()[0] != 0;
  std::vector<int64_t> indxuo;
  if (!gamma) {
    indxuo = widen(r.ints());
  } else {
    indxuo.resize(no_u);
    for (int64_t i = 0; i < no_u; ++i) indxuo[i] = i + 1;
  }
  auto numh = widen(r.ints());
  if (static_cast<int64_t>(numh.size()) != no_u) {
    std::fprintf(stderr, "hsx_reader: numh size %zu != no_u %lld\n",
                 numh.size(), static_cast<long long>(no_u));
    return 1;
  }
  std::vector<int64_t> listh;
  listh.reserve(nh);
  for (int64_t io = 0; io < no_u; ++io) {
    auto row = widen(r.ints());
    listh.insert(listh.end(), row.begin(), row.end());
  }
  if (static_cast<int64_t>(listh.size()) != nh) {
    std::fprintf(stderr, "hsx_reader: listh total %zu != nh %lld\n",
                 listh.size(), static_cast<long long>(nh));
    return 1;
  }
  // H rows: float32 Ry -> float64 Hartree (widen first, then scale — same
  // op order as the numpy parser for bit-identical results).
  std::vector<std::vector<double>> hamilt(nspin);
  for (int64_t s = 0; s < nspin; ++s) {
    hamilt[s].reserve(nh);
    for (int64_t io = 0; io < no_u; ++io) {
      auto row = r.floats();
      for (float v : row) hamilt[s].push_back(static_cast<double>(v) * RY2HA);
    }
  }
  std::vector<double> sover;
  sover.reserve(nh);
  for (int64_t io = 0; io < no_u; ++io) {
    auto row = r.floats();
    for (float v : row) sover.push_back(static_cast<double>(v));
  }
  r.record();  // qtot, temp (2 float64) — not part of the HSXData contract
  std::vector<double> xij;  // row-major (nh, 3)
  xij.reserve(nh * 3);
  for (int64_t io = 0; io < no_u; ++io) {
    auto row = r.floats();
    for (float v : row) xij.push_back(static_cast<double>(v));
  }
  const int64_t nspecies = r.ints()[0];
  auto spec_rec = r.record();  // (label*20, zval f64, no i32) * nspecies
  const size_t item = spec_rec.size() / static_cast<size_t>(nspecies);
  std::vector<int64_t> species_no(nspecies);
  std::vector<double> zval(nspecies);
  for (int64_t s = 0; s < nspecies; ++s) {
    const char* chunk = spec_rec.data() + s * item;
    int32_t no32;
    std::memcpy(&no32, chunk + item - 4, 4);
    species_no[s] = no32;
    std::memcpy(&zval[s], chunk + item - 12, 8);
  }
  for (int64_t s = 0; s < nspecies; ++s)
    for (int64_t o = 0; o < species_no[s]; ++o) r.record();  // nquant,lquant,zeta
  const int64_t na_u = r.ints()[0];
  auto isa = widen(r.ints());
  if (static_cast<int64_t>(isa.size()) != na_u) {
    std::fprintf(stderr, "hsx_reader: isa size %zu != na_u %lld\n", isa.size(),
                 static_cast<long long>(na_u));
    return 1;
  }
  auto pair = widen(r.ints());  // iaorb, iphorb interleaved (or iaorb alone)
  std::vector<int64_t> iaorb;
  if (static_cast<int64_t>(pair.size()) == 2 * no_u) {
    iaorb.resize(no_u);
    for (int64_t i = 0; i < no_u; ++i) iaorb[i] = pair[2 * i];
  } else {
    iaorb = pair;
  }

  FILE* out = stdout;
  if (argc >= 3) {
    out = std::fopen(argv[2], "w");
    if (!out) {
      std::fprintf(stderr, "hsx_reader: cannot write %s\n", argv[2]);
      return 1;
    }
  }
  JsonWriter w(out);
  w.scalar("no_u", no_u);
  w.scalar("no_s", no_s);
  w.scalar("nspin", nspin);
  w.scalar("nh", nh);
  w.scalar("gamma", gamma ? 1 : 0);
  w.arr_int("indxuo", indxuo);
  w.arr_int("numh", numh);
  w.arr_int("listh", listh);
  w.arr_dbl2("hamilt", hamilt);
  w.arr_dbl("sover", sover);
  w.arr_dbl("xij", xij);
  w.arr_int("species_no", species_no);
  w.arr_dbl("zval", zval);
  w.arr_int("isa", isa);
  w.arr_int("iaorb", iaorb);
  w.finish();
  if (out != stdout) std::fclose(out);
  return 0;
}
