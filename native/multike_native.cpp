// Native helpers for MultiKE-TPU.
//
// lev_ratio_matrix: dense Levenshtein.ratio matrix between two string lists.
// The reference computes this with an O(P1*P2) pure-Python double loop during
// predicate-alignment seeding (predicate_alignment.py:46-59); here it is a
// multithreaded C++ kernel operating on UTF-8 codepoints, exposed via ctypes.
//
// ratio(a, b) follows python-Levenshtein: (|a|+|b|-D)/(|a|+|b|) where D is
// the edit distance with insert/delete cost 1 and substitution cost 2.
//
// Build: make -C native   (produces libmultike_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Decode UTF-8 into codepoints; invalid bytes are kept as raw values so the
// function is total.
std::vector<uint32_t> decode_utf8(const char* s) {
  std::vector<uint32_t> out;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(s);
  while (*p) {
    uint32_t cp = 0;
    int extra = 0;
    unsigned char c = *p;
    if (c < 0x80) {
      cp = c;
    } else if ((c >> 5) == 0x6) {
      cp = c & 0x1F; extra = 1;
    } else if ((c >> 4) == 0xE) {
      cp = c & 0x0F; extra = 2;
    } else if ((c >> 3) == 0x1E) {
      cp = c & 0x07; extra = 3;
    } else {
      out.push_back(c); ++p; continue;
    }
    ++p;
    bool ok = true;
    for (int i = 0; i < extra; ++i) {
      if ((*p & 0xC0) != 0x80) { ok = false; break; }
      cp = (cp << 6) | (*p & 0x3F);
      ++p;
    }
    out.push_back(ok ? cp : 0xFFFD);
  }
  return out;
}

double lev_ratio(const std::vector<uint32_t>& a, const std::vector<uint32_t>& b,
                 std::vector<uint32_t>& prev, std::vector<uint32_t>& cur) {
  const size_t la = a.size(), lb = b.size();
  const size_t total = la + lb;
  if (total == 0) return 1.0;
  if (la == 0 || lb == 0) return 0.0;
  prev.resize(lb + 1);
  cur.resize(lb + 1);
  for (size_t j = 0; j <= lb; ++j) prev[j] = static_cast<uint32_t>(j);
  for (size_t i = 1; i <= la; ++i) {
    cur[0] = static_cast<uint32_t>(i);
    const uint32_t ca = a[i - 1];
    for (size_t j = 1; j <= lb; ++j) {
      uint32_t sub = prev[j - 1] + (ca == b[j - 1] ? 0u : 2u);
      uint32_t v = std::min(std::min(prev[j] + 1u, cur[j - 1] + 1u), sub);
      cur[j] = v;
    }
    std::swap(prev, cur);
  }
  return static_cast<double>(total - prev[lb]) / static_cast<double>(total);
}

}  // namespace

extern "C" {

// out is row-major (n1, n2) double.
void lev_ratio_matrix(const char** names1, int n1, const char** names2, int n2,
                      double* out, int threads) {
  std::vector<std::vector<uint32_t>> d1(n1), d2(n2);
  for (int i = 0; i < n1; ++i) d1[i] = decode_utf8(names1[i]);
  for (int j = 0; j < n2; ++j) d2[j] = decode_utf8(names2[j]);

  if (threads < 1) threads = 1;
  threads = std::min(threads, std::max(1, n1));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      std::vector<uint32_t> prev, cur;
      for (int i = t; i < n1; i += threads) {
        for (int j = 0; j < n2; ++j) {
          out[static_cast<size_t>(i) * n2 + j] = lev_ratio(d1[i], d2[j], prev, cur);
        }
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
