// Native PDB parser for the atom37 Protein representation.
//
// Mirrors esmdiff_tpu/core/protein.py::_parse_model_lines /
// from_pdb_string semantics exactly (same record filters, altloc rules,
// first-atom-wins dedup, per-model chain pick, MODEL/ENDMDL handling) —
// parity is pinned by tests/test_core.py::test_native_pdb_parser_parity.
// The residue/atom vocabularies are injected from Python at load time
// (pdbio_init) so core/residue_constants.py stays the single source of
// truth.  Exposed through a minimal C ABI consumed via ctypes
// (esmdiff_tpu/core/protein.py::_load_pdbio).
//
// Replaces the hot Python loop in ensemble loading (multi-MODEL benchmark
// targets run to 1000+ models; reference loads these through Biopython,
// slm/utils/eval_utils.py:319-419).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxAtoms = 64;  // atom37 today; leave headroom

struct Residue {
  int aatype = 0;
  int resseq = 0;
  float pos[kMaxAtoms][3] = {};
  float mask[kMaxAtoms] = {};
  float bfac[kMaxAtoms] = {};
};

struct Model {
  std::vector<Residue> residues;
};

struct Ensemble {
  std::vector<Model> models;
};

std::unordered_map<std::string, int> g_atom_order;
std::unordered_map<std::string, int> g_res3_to_idx;
int g_n_atoms = 0;
bool g_init = false;

inline std::string strip(const char* s, int n) {
  int a = 0, b = n;
  while (a < b && s[a] == ' ') ++a;
  while (b > a && s[b - 1] == ' ') --b;
  return std::string(s + a, b - a);
}

// Strict numeric parsing matching Python's float()/int() accept semantics on
// the stripped token.  kDefer means "this token may parse differently in
// Python (or raise there)" — the caller must abort the native parse so the
// pure-Python fallback defines behavior (ADVICE round 2: the native path must
// agree with Python on accept-vs-reject, not just on mutually accepted
// files).  Tokens containing x/X/p/P/_ are deferred because strtof accepts
// hex floats Python rejects and Python accepts digit-group underscores
// strtof rejects.
enum class NumParse { kOk, kEmpty, kDefer };

inline NumParse strict_float(const char* s, int a, int b, int n, float* out) {
  if (b > n) b = n;
  if (a > b) a = b;
  while (a < b && (s[a] == ' ' || s[a] == '\t')) ++a;
  while (b > a && (s[b - 1] == ' ' || s[b - 1] == '\t')) --b;
  if (a == b) return NumParse::kEmpty;
  for (int i = a; i < b; ++i) {
    unsigned char c = (unsigned char)s[i];
    if (c >= 0x80 || c == 'x' || c == 'X' || c == 'p' || c == 'P' || c == '_')
      return NumParse::kDefer;
  }
  char tmp[40];
  int len = b - a;
  if (len > 39) return NumParse::kDefer;
  std::memcpy(tmp, s + a, len);
  tmp[len] = 0;
  char* end = nullptr;
  float v = std::strtof(tmp, &end);
  if (end != tmp + len) return NumParse::kDefer;
  *out = v;
  return NumParse::kOk;
}

inline NumParse strict_int(const char* s, int a, int b, int n, int* out) {
  if (b > n) b = n;
  if (a > b) a = b;
  while (a < b && (s[a] == ' ' || s[a] == '\t')) ++a;
  while (b > a && (s[b - 1] == ' ' || s[b - 1] == '\t')) --b;
  if (a == b) return NumParse::kEmpty;
  int i = a;
  if (s[i] == '+' || s[i] == '-') ++i;
  if (i == b) return NumParse::kDefer;
  for (; i < b; ++i)
    if (s[i] < '0' || s[i] > '9') return NumParse::kDefer;
  char tmp[16];
  int len = b - a;
  if (len > 15) return NumParse::kDefer;
  std::memcpy(tmp, s + a, len);
  tmp[len] = 0;
  *out = (int)std::strtol(tmp, nullptr, 10);
  return NumParse::kOk;
}

// Parse the lines of one model into residues (insertion-ordered, first
// atom occurrence wins), matching _parse_model_lines.  Returns false when a
// line's semantics can't be reproduced with certainty (Python would raise
// ValueError/IndexError on it, or might parse a numeric token differently) —
// the caller then aborts the native parse and the Python fallback defines
// accept/reject behavior.  Filter ORDER mirrors _parse_model_lines exactly:
// a short line on a non-picked chain is skipped (not an error) in both.
bool parse_model(const std::vector<std::pair<const char*, int>>& lines,
                 char chain_id, Model* out) {
  char picked = chain_id;
  std::unordered_map<int64_t, int> index;  // (resseq, icode) -> residue idx
  for (const auto& ln : lines) {
    const char* s = ln.first;
    const int n = ln.second;
    bool is_atom = n >= 4 && std::memcmp(s, "ATOM", 4) == 0;
    bool is_het = n >= 6 && std::memcmp(s, "HETATM", 6) == 0;
    if (!is_atom && !is_het) continue;
    std::string resname = strip(s + 17 > s + n ? s + n : s + 17,
                                n > 20 ? 3 : (n > 17 ? n - 17 : 0));
    auto rit = g_res3_to_idx.find(resname);
    if (is_het && rit == g_res3_to_idx.end()) continue;
    if (n < 22) return false;  // Python: line[21] raises IndexError
    char ch = s[21];
    if (picked == 0) picked = ch;
    if (ch != picked) continue;
    char altloc = s[16];
    if (altloc != ' ' && altloc != 'A' && altloc != '1') continue;
    std::string atom_name = strip(s + 12, 4);
    auto ait = g_atom_order.find(atom_name);
    if (ait == g_atom_order.end()) continue;
    int resseq = 0;
    if (strict_int(s, 22, 26, n, &resseq) != NumParse::kOk)
      return false;  // Python: int() raises
    if (n < 27) return false;  // Python: line[26] raises IndexError
    char icode = s[26];
    int64_t key = ((int64_t)resseq << 8) | (uint8_t)icode;
    auto it = index.find(key);
    int ri;
    if (it == index.end()) {
      ri = (int)out->residues.size();
      index.emplace(key, ri);
      out->residues.emplace_back();
      Residue& r = out->residues.back();
      r.resseq = resseq;
      r.aatype = (rit == g_res3_to_idx.end()) ? -1 : rit->second;
      if (r.aatype < 0) r.aatype = g_res3_to_idx.at("*UNK*");
    } else {
      ri = it->second;
    }
    Residue& r = out->residues[ri];
    int ai = ait->second;
    float x, y, z;
    if (strict_float(s, 30, 38, n, &x) != NumParse::kOk ||
        strict_float(s, 38, 46, n, &y) != NumParse::kOk ||
        strict_float(s, 46, 54, n, &z) != NumParse::kOk)
      return false;  // Python: float() raises on empty or malformed
    float b = 0.0f;
    switch (strict_float(s, 60, 66, n, &b)) {
      case NumParse::kOk:
        break;
      case NumParse::kEmpty:
        b = 0.0f;  // Python: float('') ValueError, caught -> 0.0
        break;
      case NumParse::kDefer:
        return false;  // Python might parse it (e.g. 1_0) or catch -> 0.0
    }
    if (r.mask[ai] != 0.0f) continue;  // setdefault: first occurrence wins
    r.pos[ai][0] = x;
    r.pos[ai][1] = y;
    r.pos[ai][2] = z;
    r.mask[ai] = 1.0f;
    r.bfac[ai] = b;
  }
  return true;
}

}  // namespace

extern "C" {

// atom_csv: comma-separated atom37 names, order = atom index.
// res3_csv: comma-separated 3-letter residue codes; res_idx[i] = aatype
// index for that code.  unk_index = aatype for unmatched ATOM resnames.
void pdbio_init(const char* atom_csv, const char* res3_csv,
                const int* res_idx, int n_res, int unk_index) {
  g_atom_order.clear();
  g_res3_to_idx.clear();
  int idx = 0;
  const char* p = atom_csv;
  while (*p) {
    const char* q = std::strchr(p, ',');
    int len = q ? (int)(q - p) : (int)std::strlen(p);
    g_atom_order.emplace(std::string(p, len), idx++);
    if (!q) break;
    p = q + 1;
  }
  g_n_atoms = idx;
  p = res3_csv;
  for (int i = 0; i < n_res && *p; ++i) {
    const char* q = std::strchr(p, ',');
    int len = q ? (int)(q - p) : (int)std::strlen(p);
    g_res3_to_idx.emplace(std::string(p, len), res_idx[i]);
    p = q ? q + 1 : p + len;
  }
  g_res3_to_idx.emplace("*UNK*", unk_index);
  g_init = true;
}

// chain_id: 0 = auto-pick first chain per model.  Returns nullptr when not
// initialized OR when the input contains a line whose Python-parser
// semantics the native path can't reproduce (the caller falls back to the
// pure-Python parser, which raises or parses as appropriate).
void* pdbio_parse(const char* buf, int64_t len, char chain_id) {
  if (!g_init) return nullptr;
  auto* ens = new Ensemble();
  std::vector<std::pair<const char*, int>> current;
  bool seen_model = false;
  bool current_has_atoms = false;
  bool defer = false;

  auto flush = [&]() {
    ens->models.emplace_back();
    if (!parse_model(current, chain_id, &ens->models.back())) defer = true;
    if (ens->models.back().residues.empty()) ens->models.pop_back();
    current.clear();
    current_has_atoms = false;
  };

  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    const char* nl = (const char*)std::memchr(p, '\n', end - p);
    int n = nl ? (int)(nl - p) : (int)(end - p);
    if (n > 0 && p[n - 1] == '\r') --n;
    if (n >= 5 && std::memcmp(p, "MODEL", 5) == 0) {
      seen_model = true;
      current.clear();  // reference resets on MODEL (protein.py:204-206)
      current_has_atoms = false;
    } else if (n >= 6 && std::memcmp(p, "ENDMDL", 6) == 0) {
      flush();
    } else {
      current.emplace_back(p, n);
      if ((n >= 4 && std::memcmp(p, "ATOM", 4) == 0) ||
          (n >= 6 && std::memcmp(p, "HETATM", 6) == 0))
        current_has_atoms = true;
    }
    if (!nl) break;
    p = nl + 1;
  }
  if (!seen_model || current_has_atoms) flush();
  if (defer) {
    delete ens;
    return nullptr;
  }
  return ens;
}

int pdbio_n_models(void* h) {
  return h ? (int)((Ensemble*)h)->models.size() : 0;
}

int pdbio_model_len(void* h, int m) {
  auto* ens = (Ensemble*)h;
  if (!ens || m < 0 || m >= (int)ens->models.size()) return 0;
  return (int)ens->models[m].residues.size();
}

// pos: (L, n_atoms, 3) float32; mask/bfac: (L, n_atoms); aatype/residx: (L,)
void pdbio_model_fill(void* h, int m, float* pos, float* mask, float* bfac,
                      int* aatype, int* residx) {
  auto* ens = (Ensemble*)h;
  const Model& mod = ens->models[m];
  const int A = g_n_atoms;
  for (size_t i = 0; i < mod.residues.size(); ++i) {
    const Residue& r = mod.residues[i];
    aatype[i] = r.aatype;
    residx[i] = r.resseq;
    for (int a = 0; a < A; ++a) {
      pos[(i * A + a) * 3 + 0] = r.pos[a][0];
      pos[(i * A + a) * 3 + 1] = r.pos[a][1];
      pos[(i * A + a) * 3 + 2] = r.pos[a][2];
      mask[i * A + a] = r.mask[a];
      bfac[i * A + a] = r.bfac[a];
    }
  }
}

void pdbio_free(void* h) { delete (Ensemble*)h; }

}  // extern "C"
