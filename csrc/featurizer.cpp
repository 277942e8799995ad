// eagcn_tpu native featurizer: SMILES -> graph arrays.
//
// C++ mirror of eagcn_tpu/chem (smiles.py / perception.py / featurize.py):
// same grammar subset, same perception rules, same 24-dim atom features and
// 5 relation ids per bond.  Exposed through a C ABI consumed via ctypes
// (eagcn_tpu/chem/native.py); the Python implementation remains the
// reference and fallback — tests assert bit-identical outputs on all four
// MoleculeNet CSVs.
//
// Also hosts the mega-graph batch packer (see eagcn_pack below), the other
// hot host-side loop.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <deque>
#include <map>
#include <set>
#include <string>
#include <vector>

namespace {

constexpr double kSingle = 1.0, kAromatic = 1.5, kDouble = 2.0, kTriple = 3.0;

enum ErrorCode {
  OK = 0,
  ERR_PARSE = 1,
  ERR_ATOM = 2,
  ERR_GRAPH = 3,
  ERR_FEATURIZE = 4,
};

enum Hyb { HYB_OTHER = 0, SP = 1, SP2 = 2, SP3 = 3 };

struct Atom {
  int z = 0;
  bool aromatic = false;
  int charge = 0;
  int explicit_h = -1;  // -1 => compute implicit
  int isotope = 0;
  int implicit_h = 0;
  bool in_ring = false;
  int hyb = SP3;
  int degree = 0;
  int subtype = 0;
  int total_h() const { return explicit_h >= 0 ? explicit_h : implicit_h; }
};

struct Bond {
  int a1 = 0, a2 = 0;
  double order = kSingle;
  bool aromatic = false;
  bool in_ring = false;
  bool conjugated = false;
  int other(int i) const { return i == a1 ? a2 : a1; }
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  // adjacency: per atom, (neighbor, bond index)
  std::vector<std::vector<std::pair<int, int>>> adj;
  void build_adj() {
    adj.assign(atoms.size(), {});
    for (int k = 0; k < (int)bonds.size(); ++k) {
      adj[bonds[k].a1].push_back({bonds[k].a2, k});
      adj[bonds[k].a2].push_back({bonds[k].a1, k});
    }
  }
};

// ---------------------------------------------------------------- periodic
int symbol_to_num(const std::string& s) {
  static const std::map<std::string, int> tbl = {
      {"H", 1},  {"He", 2}, {"Li", 3}, {"Be", 4}, {"B", 5},  {"C", 6},
      {"N", 7},  {"O", 8},  {"F", 9},  {"Ne", 10}, {"Na", 11}, {"Mg", 12},
      {"Al", 13}, {"Si", 14}, {"P", 15}, {"S", 16}, {"Cl", 17}, {"Ar", 18},
      {"K", 19}, {"Ca", 20}, {"Sc", 21}, {"Ti", 22}, {"V", 23}, {"Cr", 24},
      {"Mn", 25}, {"Fe", 26}, {"Co", 27}, {"Ni", 28}, {"Cu", 29}, {"Zn", 30},
      {"Ga", 31}, {"Ge", 32}, {"As", 33}, {"Se", 34}, {"Br", 35}, {"Kr", 36},
      {"Rb", 37}, {"Sr", 38}, {"Y", 39}, {"Zr", 40}, {"Nb", 41}, {"Mo", 42},
      {"Tc", 43}, {"Ru", 44}, {"Rh", 45}, {"Pd", 46}, {"Ag", 47}, {"Cd", 48},
      {"In", 49}, {"Sn", 50}, {"Sb", 51}, {"Te", 52}, {"I", 53}, {"Xe", 54},
      {"Cs", 55}, {"Ba", 56}, {"La", 57}, {"Ce", 58}, {"Pr", 59}, {"Nd", 60},
      {"Pm", 61}, {"Sm", 62}, {"Eu", 63}, {"Gd", 64}, {"Tb", 65}, {"Dy", 66},
      {"Ho", 67}, {"Er", 68}, {"Tm", 69}, {"Yb", 70}, {"Lu", 71}, {"Hf", 72},
      {"Ta", 73}, {"W", 74}, {"Re", 75}, {"Os", 76}, {"Ir", 77}, {"Pt", 78},
      {"Au", 79}, {"Hg", 80}, {"Tl", 81}, {"Pb", 82}, {"Bi", 83}, {"Po", 84},
      {"At", 85}, {"Rn", 86}, {"Fr", 87}, {"Ra", 88}, {"Ac", 89}, {"Th", 90},
      {"Pa", 91}, {"U", 92}, {"Np", 93}, {"Pu", 94},
  };
  auto it = tbl.find(s);
  return it == tbl.end() ? 0 : it->second;
}

double mono_mass(int z) {
  static const std::map<int, double> tbl = {
      {1, 1.00782503207}, {5, 11.0093054},  {6, 12.0},
      {7, 14.0030740048}, {8, 15.9949146196}, {9, 18.99840322},
      {14, 27.9769265325}, {15, 30.97376163}, {16, 31.97207100},
      {17, 34.96885268},  {35, 78.9183371},  {53, 126.904473},
      {3, 7.016}, {11, 22.9898}, {12, 23.985}, {13, 26.9815},
      {19, 38.9637}, {20, 39.9626}, {26, 55.9349}, {29, 62.9296},
      {30, 63.9291}, {33, 74.9216}, {34, 79.9165}, {47, 106.9051},
      {50, 119.9022}, {78, 194.9648}, {80, 201.9706},
  };
  auto it = tbl.find(z);
  return it == tbl.end() ? 2.0 * z : it->second;
}

bool default_valences(int z, std::vector<int>* out) {
  switch (z) {
    case 5: *out = {3}; return true;
    case 6: *out = {4}; return true;
    case 7: *out = {3, 5}; return true;
    case 8: *out = {2}; return true;
    case 9: case 17: case 35: case 53: *out = {1}; return true;
    case 15: *out = {3, 5}; return true;
    case 16: *out = {2, 4, 6}; return true;
    default: return false;
  }
}

bool is_lone_pair_donor(int z) {
  return z == 7 || z == 8 || z == 15 || z == 16 || z == 9 || z == 17 ||
         z == 35 || z == 53;
}

// ------------------------------------------------------------------ parser
struct Parser {
  const std::string s;
  size_t i = 0;
  Mol mol;
  std::string err;

  explicit Parser(const std::string& text) : s(text) {}

  bool fail(const std::string& m) {
    err = m;
    return false;
  }

  bool add_bond(int a1, int a2, double order) {
    for (auto& b : mol.bonds)
      if ((b.a1 == a1 && b.a2 == a2) || (b.a1 == a2 && b.a2 == a1))
        return fail("duplicate bond");
    Bond b;
    b.a1 = a1;
    b.a2 = a2;
    b.order = order;
    b.aromatic = (order == kAromatic);
    mol.bonds.push_back(b);
    return true;
  }

  bool parse() {
    int prev = -1;
    double pending = -1.0;  // -1 = none
    std::vector<int> branch;
    std::map<int, std::pair<int, double>> ring;  // num -> (atom, order)
    while (i < s.size()) {
      char c = s[i];
      double bo = -1.0;
      switch (c) {
        case '-': case '/': case '\\': case '~': bo = kSingle; break;
        case '=': bo = kDouble; break;
        case '#': bo = kTriple; break;
        case ':': bo = kAromatic; break;
      }
      if (bo >= 0) {
        if (pending >= 0) return fail("two bond symbols");
        pending = bo;
        ++i;
        continue;
      }
      if (c == '.') {
        if (pending >= 0) return fail("bond before dot");
        prev = -1;
        ++i;
        continue;
      }
      if (c == '(') {
        if (prev < 0) return fail("branch with no atom");
        branch.push_back(prev);
        pending = -1.0;
        ++i;
        continue;
      }
      if (c == ')') {
        if (branch.empty()) return fail("unmatched )");
        prev = branch.back();
        branch.pop_back();
        pending = -1.0;
        ++i;
        continue;
      }
      if (isdigit(c) || c == '%') {
        if (prev < 0) return fail("ring closure with no atom");
        int num;
        if (c == '%') {
          if (i + 2 >= s.size() || !isdigit(s[i + 1]) || !isdigit(s[i + 2]))
            return fail("bad %nn");
          num = (s[i + 1] - '0') * 10 + (s[i + 2] - '0');
          i += 3;
        } else {
          num = c - '0';
          ++i;
        }
        auto it = ring.find(num);
        if (it != ring.end()) {
          int open_atom = it->second.first;
          double open_order = it->second.second;
          ring.erase(it);
          if (open_order >= 0 && pending >= 0 && open_order != pending)
            return fail("conflicting ring orders");
          double order = open_order >= 0 ? open_order : pending;
          if (order < 0)
            order = (mol.atoms[open_atom].aromatic && mol.atoms[prev].aromatic)
                        ? kAromatic : kSingle;
          if (open_atom == prev) return fail("self ring bond");
          if (!add_bond(open_atom, prev, order)) return false;
        } else {
          ring[num] = {prev, pending};
        }
        pending = -1.0;
        continue;
      }
      Atom atom;
      if (c == '[') {
        size_t j = s.find(']', i);
        if (j == std::string::npos) return fail("unclosed bracket");
        if (!parse_bracket(s.substr(i + 1, j - i - 1), &atom)) return false;
        i = j + 1;
      } else if (isalpha(c) || c == '*') {
        if (!parse_organic(&atom)) return false;
      } else {
        return fail("unexpected char");
      }
      int idx = (int)mol.atoms.size();
      mol.atoms.push_back(atom);
      if (prev >= 0) {
        double order = pending;
        if (order < 0)
          order = (mol.atoms[prev].aromatic && atom.aromatic) ? kAromatic
                                                              : kSingle;
        if (!add_bond(prev, idx, order)) return false;
      }
      pending = -1.0;
      prev = idx;
    }
    if (!branch.empty()) return fail("unclosed branch");
    if (!ring.empty()) return fail("unclosed ring bond");
    if (pending >= 0) return fail("dangling bond");
    if (mol.atoms.empty()) return fail("no atoms");
    return true;
  }

  bool parse_organic(Atom* a) {
    if (s.compare(i, 2, "Cl") == 0) { a->z = 17; i += 2; return true; }
    if (s.compare(i, 2, "Br") == 0) { a->z = 35; i += 2; return true; }
    char c = s[i];
    if (c == '*') return fail("wildcard unsupported");
    static const std::string upper = "BCNOPSFI";
    static const std::string lower = "bcnops";
    if (upper.find(c) != std::string::npos) {
      a->z = symbol_to_num(std::string(1, c));
      ++i;
      return true;
    }
    if (lower.find(c) != std::string::npos) {
      a->z = symbol_to_num(std::string(1, (char)toupper(c)));
      a->aromatic = true;
      ++i;
      return true;
    }
    return fail("unknown organic symbol");
  }

  bool parse_bracket(const std::string& body, Atom* a) {
    if (body.empty()) return fail("empty bracket");
    size_t k = 0;
    while (k < body.size() && isdigit(body[k]))
      a->isotope = a->isotope * 10 + (body[k++] - '0');
    // element symbol (2-letter first, then 1-letter; aromatic lowercase)
    static const std::set<std::string> arom_ok = {"b", "c", "n", "o", "p",
                                                 "s", "se", "as", "te", "si"};
    std::string sym;
    bool aromatic = false;
    for (int len = 2; len >= 1 && sym.empty(); --len) {
      if (k + len > body.size()) continue;
      std::string cand = body.substr(k, len);
      if (symbol_to_num(cand)) {
        sym = cand;
        break;
      }
      std::string low = cand;
      bool all_lower = true;
      for (char ch : cand) all_lower = all_lower && islower(ch);
      if (all_lower && arom_ok.count(low)) {
        std::string cap = low;
        cap[0] = (char)toupper(cap[0]);
        if (symbol_to_num(cap)) {
          sym = cap;
          aromatic = true;
          break;
        }
      }
    }
    if (sym.empty()) return fail("unknown element in bracket");
    a->z = symbol_to_num(sym);
    a->aromatic = aromatic;
    k += sym.size();
    // chirality
    if (k < body.size() && body[k] == '@') {
      ++k;
      if (k < body.size() && body[k] == '@') ++k;
      static const std::vector<std::string> tags = {"TH", "AL", "SP", "TB",
                                                    "OH"};
      for (const auto& t : tags) {
        if (body.compare(k, t.size(), t) == 0 && k + t.size() < body.size() &&
            isdigit(body[k + t.size()])) {
          k += t.size();
          while (k < body.size() && isdigit(body[k])) ++k;
          break;
        }
      }
    }
    // explicit H
    a->explicit_h = 0;
    if (k < body.size() && body[k] == 'H') {
      ++k;
      int h = 0;
      while (k < body.size() && isdigit(body[k])) h = h * 10 + (body[k++] - '0');
      a->explicit_h = h > 0 ? h : 1;
    }
    // charge
    while (k < body.size() && (body[k] == '+' || body[k] == '-')) {
      int sign = body[k] == '+' ? 1 : -1;
      ++k;
      int mag = 0;
      while (k < body.size() && isdigit(body[k])) mag = mag * 10 + (body[k++] - '0');
      if (mag == 0) {
        mag = 1;
        while (k < body.size() && body[k] == (sign > 0 ? '+' : '-')) {
          ++mag;
          ++k;
        }
      }
      a->charge += sign * mag;
    }
    // atom class
    if (k < body.size() && body[k] == ':') {
      ++k;
      if (k == body.size() || !isdigit(body[k])) return fail("bad atom class");
      while (k < body.size() && isdigit(body[k])) ++k;
    }
    if (k != body.size()) return fail("trailing junk in bracket");
    return true;
  }
};

// -------------------------------------------------------------- perception
double bond_order_sum(const Mol& m, int i) {
  double s = 0;
  for (auto& [nb, bi] : m.adj[i]) s += m.bonds[bi].order;
  return s;
}

void compute_degrees(Mol& m) {
  for (auto& a : m.atoms) a.degree = 0;
  for (auto& b : m.bonds) {
    m.atoms[b.a1].degree++;
    m.atoms[b.a2].degree++;
  }
}

void compute_implicit_h(Mol& m) {
  for (int i = 0; i < (int)m.atoms.size(); ++i) {
    Atom& a = m.atoms[i];
    if (a.explicit_h >= 0) {
      a.implicit_h = a.explicit_h;
      continue;
    }
    std::vector<int> vals;
    if (!default_valences(a.z, &vals)) {
      a.implicit_h = 0;
      continue;
    }
    if (a.aromatic) {
      a.implicit_h = (a.z == 5 || a.z == 6) ? std::max(0, 3 - a.degree) : 0;
      continue;
    }
    int bsum = (int)std::lround(bond_order_sum(m, i));
    a.implicit_h = 0;
    for (int v : vals)
      if (bsum <= v) {
        a.implicit_h = v - bsum;
        break;
      }
  }
}

void perceive_rings(Mol& m) {
  int n = (int)m.atoms.size();
  std::vector<bool> visited(n, false);
  std::vector<int> tin(n, 0), low(n, 0);
  int timer = 0;
  std::vector<bool> is_bridge(m.bonds.size(), false);
  // iterative DFS
  struct Frame { int v, pb; size_t ptr; };
  for (int root = 0; root < n; ++root) {
    if (visited[root]) continue;
    std::vector<Frame> stack{{root, -1, 0}};
    while (!stack.empty()) {
      Frame f = stack.back();
      stack.pop_back();
      if (f.ptr == 0) {
        visited[f.v] = true;
        tin[f.v] = low[f.v] = ++timer;
      }
      if (f.ptr < m.adj[f.v].size()) {
        stack.push_back({f.v, f.pb, f.ptr + 1});
        auto [to, bi] = m.adj[f.v][f.ptr];
        if (bi == f.pb) continue;
        if (visited[to])
          low[f.v] = std::min(low[f.v], tin[to]);
        else
          stack.push_back({to, bi, 0});
      } else if (f.pb >= 0) {
        int parent = m.bonds[f.pb].other(f.v);
        low[parent] = std::min(low[parent], low[f.v]);
        if (low[f.v] > tin[parent]) is_bridge[f.pb] = true;
      }
    }
  }
  for (size_t k = 0; k < m.bonds.size(); ++k) m.bonds[k].in_ring = !is_bridge[k];
  for (auto& a : m.atoms) a.in_ring = false;
  for (auto& b : m.bonds)
    if (b.in_ring) {
      m.atoms[b.a1].in_ring = true;
      m.atoms[b.a2].in_ring = true;
    }
}

// Relevant small rings: the shortest cycle through EVERY ring bond
// (chord-only fundamental cycles collapse onto the 5-ring of fused 5-6
// Kekule bicyclics — indole/purine — and never produce the benzo ring;
// mirrors eagcn_tpu/chem/perception.py:_small_rings).
std::vector<std::vector<int>> small_rings(const Mol& m, int max_size) {
  int n = (int)m.atoms.size();
  std::vector<std::vector<int>> rings;
  std::set<std::set<int>> keys;
  for (int bi = 0; bi < (int)m.bonds.size(); ++bi) {
    if (!m.bonds[bi].in_ring) continue;  // bridges have no cycle
    const Bond& b = m.bonds[bi];
    std::vector<int> prev(n, -1);
    prev[b.a1] = b.a1;
    std::deque<int> dq{b.a1};
    bool found = false;
    while (!dq.empty() && !found) {
      int v = dq.front();
      dq.pop_front();
      for (auto& [to, ei] : m.adj[v]) {
        if (ei == bi || prev[to] != -1) continue;
        prev[to] = v;
        if (to == b.a2) {
          found = true;
          break;
        }
        dq.push_back(to);
      }
    }
    if (!found) continue;
    std::vector<int> path{b.a2};
    while (path.back() != b.a1) path.push_back(prev[path.back()]);
    if ((int)path.size() <= max_size) {
      std::set<int> key(path.begin(), path.end());
      if (!keys.count(key)) {
        keys.insert(key);
        rings.push_back(path);
      }
    }
  }
  return rings;
}

// returns -1 when atom cannot be aromatic
int pi_electrons(const Mol& m, int v, const std::set<int>& ring) {
  const Atom& a = m.atoms[v];
  if (!(a.z == 5 || a.z == 6 || a.z == 7 || a.z == 8 || a.z == 15 || a.z == 16))
    return -1;
  int sigma = a.degree + a.total_h();
  if (sigma > 3) return -1;
  bool endo = false, exo_ring_c = false, exo_het = false;
  for (auto& [nb, bi] : m.adj[v]) {
    const Bond& b = m.bonds[bi];
    if (b.order == kTriple) return -1;
    if (b.order == kDouble || b.aromatic) {
      const Atom& o = m.atoms[nb];
      if (ring.count(nb) || (b.aromatic && o.aromatic))
        endo = true;
      else if (o.z == 6 && o.in_ring)
        exo_ring_c = true;
      else
        exo_het = true;
    }
  }
  if (endo || exo_ring_c) return 1;
  if (exo_het) return 0;
  if ((a.z == 7 || a.z == 15) && sigma == 3) return 2;
  if ((a.z == 8 || a.z == 16) && sigma == 2) return 2;
  if (a.z == 6 && a.charge < 0 && sigma == 3) return 2;
  if (a.z == 6 && a.charge > 0 && sigma == 3) return 0;
  if (a.z == 5 && sigma == 3) return 0;
  return -1;
}

void perceive_aromaticity(Mol& m) {
  auto rings = small_rings(m, 7);
  if (rings.empty()) return;
  bool changed = true;
  int rounds = 0;
  while (changed && rounds++ < 10) {
    changed = false;
    for (auto& ring : rings) {
      std::set<int> rset(ring.begin(), ring.end());
      std::vector<int> ring_bonds;
      bool ok = true;
      for (size_t ii = 0; ii < ring.size(); ++ii) {
        int v = ring[ii], w = ring[(ii + 1) % ring.size()];
        int found = -1;
        for (auto& [nb, bi] : m.adj[v])
          if (nb == w) {
            found = bi;
            break;
          }
        if (found < 0) {
          ok = false;
          break;
        }
        ring_bonds.push_back(found);
      }
      if (!ok) continue;
      bool all_arom = true;
      for (int bi : ring_bonds) all_arom = all_arom && m.bonds[bi].aromatic;
      if (all_arom) continue;
      int electrons = 0;
      bool capable = true;
      for (int v : ring) {
        int e = pi_electrons(m, v, rset);
        if (e < 0) {
          capable = false;
          break;
        }
        electrons += e;
      }
      if (capable && electrons % 4 == 2) {
        for (int bi : ring_bonds)
          if (!m.bonds[bi].aromatic) {
            m.bonds[bi].aromatic = true;
            m.bonds[bi].order = kAromatic;
            changed = true;
          }
        for (int v : ring)
          if (!m.atoms[v].aromatic) {
            m.atoms[v].aromatic = true;
            changed = true;
          }
      }
    }
  }
}

void perceive_conjugation(Mol& m) {
  auto pi_excluding = [&](int v, int bond_idx) {
    for (auto& [nb, bi] : m.adj[v]) {
      if (bi == bond_idx) continue;
      const Bond& ob = m.bonds[bi];
      if (ob.order == kDouble || ob.order == kTriple || ob.aromatic)
        return true;
    }
    return false;
  };
  for (int k = 0; k < (int)m.bonds.size(); ++k) {
    Bond& b = m.bonds[k];
    if (b.aromatic) {
      b.conjugated = true;
      continue;
    }
    if (b.order == kSingle) {
      bool lp1 = is_lone_pair_donor(m.atoms[b.a1].z);
      bool lp2 = is_lone_pair_donor(m.atoms[b.a2].z);
      bool p1 = pi_excluding(b.a1, k), p2 = pi_excluding(b.a2, k);
      b.conjugated = (p1 || lp1) && (p2 || lp2) && (p1 || p2);
    }
  }
  for (int k = 0; k < (int)m.bonds.size(); ++k) {
    Bond& b = m.bonds[k];
    if (b.order != kDouble && b.order != kTriple) continue;
    for (int j = 0; j < (int)m.bonds.size(); ++j) {
      if (j == k || !m.bonds[j].conjugated) continue;
      const Bond& ob = m.bonds[j];
      if (ob.a1 == b.a1 || ob.a1 == b.a2 || ob.a2 == b.a1 || ob.a2 == b.a2) {
        b.conjugated = true;
        break;
      }
    }
  }
}

void perceive_hybridization(Mol& m) {
  int n = (int)m.atoms.size();
  std::vector<int> nd(n, 0), nt(n, 0);
  std::vector<bool> ar(n, false);
  for (auto& b : m.bonds) {
    if (b.aromatic) {
      ar[b.a1] = ar[b.a2] = true;
    } else if (b.order == kDouble) {
      nd[b.a1]++;
      nd[b.a2]++;
    } else if (b.order == kTriple) {
      nt[b.a1]++;
      nt[b.a2]++;
    }
  }
  for (int i = 0; i < n; ++i) {
    Atom& a = m.atoms[i];
    if (a.z == 9 || a.z == 17 || a.z == 35 || a.z == 53 || a.z == 1)
      a.hyb = SP3;
    else if (nt[i] > 0 || nd[i] >= 2)
      a.hyb = SP;
    else if (nd[i] == 1 || ar[i] || a.aromatic)
      a.hyb = SP2;
    else if (a.degree + a.total_h() > 0)
      a.hyb = SP3;
    else
      a.hyb = HYB_OTHER;
  }
}

// SUBTYPE_LIST 1-based indices (perception.py)
int subtype_index(const std::string& name) {
  static const std::vector<std::string> lst = {
      "os", "oh", "oa", "o", "un O", "c3", "c1", "ca", "c", "c2", "un C",
      "n1", "n3", "na", "n", "no", "nh", "un N", "s2", "-sh", "-ss", "un S",
      "f", "cl", "br", "i", "p", "unreconginized"};
  for (size_t i = 0; i < lst.size(); ++i)
    if (lst[i] == name) return (int)i + 1;
  return (int)lst.size();
}

void assign_subtypes(Mol& m) {
  for (int i = 0; i < (int)m.atoms.size(); ++i) {
    Atom& a = m.atoms[i];
    int z = a.z, hyb = a.hyb, deg = a.degree;
    std::string name = "unreconginized";
    if (z == 8) {
      if (hyb == SP3)
        name = deg == 2 ? "os" : (deg == 1 ? "oh" : "un O");
      else if (hyb == SP2) {
        if (a.aromatic) name = "oa";
        else if (deg == 1) name = "o";
        else if (deg == 2) name = "oa";
        else name = "un O";
      } else
        name = "un O";
    } else if (z == 6) {
      if (hyb == SP3) name = "c3";
      else if (hyb == SP) name = "c1";
      else if (hyb == SP2) {
        if (a.aromatic) name = "ca";
        else if (a.total_h() == 0 && deg == 3) name = "c";
        else if (a.total_h() == 1 && deg == 2) name = "c2";
        else name = "un C";
      } else
        name = "un C";
    } else if (z == 7) {
      if (hyb == SP) name = "n1";
      else if (hyb == SP3) name = "n3";
      else if (hyb == SP2) {
        if (a.aromatic) name = "na";
        else if (deg == 3) {
          int valence = (int)std::lround(bond_order_sum(m, i));
          if (valence == 3) name = "n";
          else if (valence == 4 && a.total_h() == 2) name = "no";
          else name = "un N";
        } else if (deg == 1) name = "n";
        else if (deg == 2) name = "nh";
        else name = "un N";
      } else
        name = "un N";
    } else if (z == 16) {
      if (hyb == SP2) name = "s2";
      else if (hyb == SP3) {
        if (deg == 1 && a.total_h() == 1) name = "-sh";
        else if (deg == 2) name = "-ss";
        else name = "un S";
      } else
        name = "un S";
    } else if (z == 9) name = "f";
    else if (z == 17) name = "cl";
    else if (z == 35) name = "br";
    else if (z == 53) name = "i";
    else if (z == 15 && hyb == SP3) name = "p";
    a.subtype = subtype_index(name);
  }
}

bool selected_atom(int z) {
  static const std::set<int> sel = {5, 6, 7, 8, 9, 15, 16, 17, 35, 53};
  return sel.count(z) > 0;
}

}  // namespace

// ------------------------------------------------------------------ C ABI

extern "C" {

struct MolResult {
  int32_t error;        // ErrorCode
  int32_t n_atoms;
  int32_t n_bonds;
  double mol_wt;
  float* atom_features;   // [n_atoms * 24]
  int32_t* subtypes;      // [n_atoms]
  int32_t* bonds;         // [n_bonds * 2]
  int32_t* bond_pair_z;   // [n_bonds * 2] sorted atomic numbers (type dict)
  int32_t* bond_feats;    // [n_bonds * 4] order_id, arom_id, conj_id, ring_id
};

static MolResult* make_error(int code) {
  auto* r = new MolResult();
  std::memset(r, 0, sizeof(MolResult));
  r->error = code;
  return r;
}

// Full featurization.  type_id resolution (dataset-dependent dictionary)
// happens Python-side from bond_pair_z.
MolResult* eagcn_featurize(const char* smiles) {
  Parser p(smiles ? smiles : "");
  if (p.s.empty() || !p.parse()) return make_error(ERR_PARSE);
  Mol& m = p.mol;
  m.build_adj();
  compute_degrees(m);
  compute_implicit_h(m);
  perceive_rings(m);
  perceive_aromaticity(m);
  perceive_conjugation(m);
  perceive_hybridization(m);
  assign_subtypes(m);

  double wt = 0;
  for (auto& a : m.atoms) wt += mono_mass(a.z) + a.total_h() * mono_mass(1);

  if (m.atoms.empty()) return make_error(ERR_GRAPH);
  for (auto& a : m.atoms)
    if (!selected_atom(a.z)) {
      auto* r = make_error(ERR_ATOM);
      r->mol_wt = wt;
      return r;
    }
  if (m.bonds.empty()) {
    auto* r = make_error(ERR_GRAPH);
    r->mol_wt = wt;
    return r;
  }

  int n = (int)m.atoms.size(), nb = (int)m.bonds.size();
  auto* r = new MolResult();
  std::memset(r, 0, sizeof(MolResult));
  r->n_atoms = n;
  r->n_bonds = nb;
  r->mol_wt = wt;
  r->atom_features = new float[n * 24]();
  r->subtypes = new int32_t[n];
  r->bonds = new int32_t[nb * 2];
  r->bond_pair_z = new int32_t[nb * 2];
  r->bond_feats = new int32_t[nb * 4];

  static const int sel[10] = {5, 6, 7, 8, 9, 15, 16, 17, 35, 53};
  for (int i = 0; i < n; ++i) {
    const Atom& a = m.atoms[i];
    float* f = r->atom_features + i * 24;
    for (int j = 0; j < 10; ++j)
      if (sel[j] == a.z) f[j] = 1.f;
    int deg = a.degree;
    if (deg > 5) {
      r->error = ERR_FEATURIZE;
      return r;
    }
    f[10 + deg] = 1.f;
    int h = a.total_h();
    if (h > 4) {
      r->error = ERR_FEATURIZE;
      return r;
    }
    f[16 + h] = 1.f;
    f[21] = (float)a.charge;
    f[22] = a.in_ring ? 1.f : 0.f;
    f[23] = a.aromatic ? 1.f : 0.f;
    r->subtypes[i] = a.subtype;
  }
  for (int k = 0; k < nb; ++k) {
    const Bond& b = m.bonds[k];
    r->bonds[k * 2] = b.a1;
    r->bonds[k * 2 + 1] = b.a2;
    int z1 = m.atoms[b.a1].z, z2 = m.atoms[b.a2].z;
    r->bond_pair_z[k * 2] = std::min(z1, z2);
    r->bond_pair_z[k * 2 + 1] = std::max(z1, z2);
    int order_id = b.order == kSingle ? 0
                   : b.order == kAromatic ? 1
                   : b.order == kDouble ? 2 : 3;
    r->bond_feats[k * 4] = order_id;
    r->bond_feats[k * 4 + 1] = b.aromatic ? 0 : 1;
    r->bond_feats[k * 4 + 2] = b.conjugated ? 0 : 1;
    r->bond_feats[k * 4 + 3] = b.in_ring ? 0 : 1;
  }
  return r;
}

void eagcn_free(MolResult* r) {
  if (!r) return;
  delete[] r->atom_features;
  delete[] r->subtypes;
  delete[] r->bonds;
  delete[] r->bond_pair_z;
  delete[] r->bond_feats;
  delete r;
}

// ------------------------------------------------------------- batch packer
// Packs molecules (concatenated arrays + offsets) into one mega-graph batch.
// Mirrors GraphBatcher.pack (eagcn_tpu/data/batching.py).  Returns 0 on
// success, 1 on budget overflow.  All output buffers are caller-allocated
// and pre-zeroed Python-side except node_mol (pre-filled with n_mols_pad)
// and mol_index (pre-filled with -1).
int32_t eagcn_pack(
    // inputs (concatenated over molecules)
    const float* afm, const int32_t* bonds, const int32_t* rels,
    const int32_t* subtypes,
    const int64_t* node_off, const int64_t* bond_off,
    const int32_t* mol_ids, int32_t n_sel, int32_t n_feat,
    // static budgets
    int32_t num_nodes, int32_t num_edges, int32_t num_mols, int32_t max_deg,
    // outputs
    float* node_feat, int32_t* node_mol, float* node_mask, float* node_conn,
    float* node_tiny, int32_t* node_subtype,
    int32_t* neigh, int32_t* neigh_rel, float* neigh_mask, int32_t* neigh_rev,
    int32_t* edge_src, int32_t* edge_dst, int32_t* edge_rel, float* edge_mask,
    float* mol_size, int32_t* mol_index, float* mol_mask,
    // block-dense tiles (tile_size == 0 -> disabled, pointers may be null);
    // molecules are then placed without straddling tile boundaries and
    // tile_adj [T,S,S] / tile_rel [T,5,S,S] (view-major) int8 tensors are
    // filled (eagcn_tpu/data/batching.py build_tile_tensors semantics)
    int32_t tile_size, int8_t* tile_adj, int8_t* tile_rel) {
  int64_t n_cursor = 0, e_cursor = 0;
  const int64_t S = tile_size;
  std::vector<int32_t> deg(num_nodes, 0);
  for (int b = 0; b < n_sel; ++b) {
    int32_t id = mol_ids[b];
    int64_t a0 = node_off[id], a1 = node_off[id + 1];
    int64_t b0 = bond_off[id], b1 = bond_off[id + 1];
    int64_t n = a1 - a0, mbonds = b1 - b0;
    if (S > 0) {
      if (n > S) return 1;  // molecule larger than a tile
      if (n_cursor / S != (n_cursor + n - 1) / S)
        n_cursor = (n_cursor + S - 1) / S * S;  // next tile boundary
    }
    if (b >= num_mols || n_cursor + n > num_nodes ||
        e_cursor + 2 * mbonds > num_edges)
      return 1;
    int64_t base = n_cursor;
    std::memcpy(node_feat + base * n_feat, afm + a0 * n_feat,
                sizeof(float) * n * n_feat);
    for (int64_t i = 0; i < n; ++i) {
      node_mol[base + i] = b;
      node_mask[base + i] = 1.f;
      node_subtype[base + i] = subtypes[a0 + i];
    }
    for (int64_t k = b0; k < b1; ++k) {
      int32_t i = (int32_t)base + bonds[k * 2];
      int32_t j = (int32_t)base + bonds[k * 2 + 1];
      const int32_t* rel = rels + k * 5;
      // reverse-slot table for the scatter-free transpose (batching.py)
      if (deg[i] < max_deg && deg[j] < max_deg) {
        neigh_rev[(int64_t)i * max_deg + deg[i]] = deg[j];
        neigh_rev[(int64_t)j * max_deg + deg[j]] = deg[i];
      }
      const int32_t pairs[2][2] = {{i, j}, {j, i}};
      for (auto& pr : pairs) {
        int32_t s = pr[0], d = pr[1];
        int32_t slot = deg[d];
        if (slot >= max_deg) return 2;
        neigh[(int64_t)d * max_deg + slot] = s;
        std::memcpy(neigh_rel + ((int64_t)d * max_deg + slot) * 5, rel,
                    sizeof(int32_t) * 5);
        neigh_mask[(int64_t)d * max_deg + slot] = 1.f;
        deg[d]++;
        edge_src[e_cursor] = s;
        edge_dst[e_cursor] = d;
        std::memcpy(edge_rel + e_cursor * 5, rel, sizeof(int32_t) * 5);
        edge_mask[e_cursor] = 1.f;
        e_cursor++;
        if (S > 0) {
          int64_t t = d / S, rr = d % S, cc = s % S;
          tile_adj[(t * S + rr) * S + cc] = 1;
          for (int q = 0; q < 5; ++q)
            tile_rel[((t * 5 + q) * S + rr) * S + cc] = (int8_t)rel[q];
        }
      }
    }
    for (int64_t i = 0; i < n; ++i)
      node_tiny[base + i] = (float)((n - deg[base + i]) * 1e-9);
    mol_size[b] = (float)n;
    mol_index[b] = id;
    mol_mask[b] = 1.f;
    n_cursor += n;
  }
  for (int32_t i = 0; i < num_nodes; ++i)
    node_conn[i] = deg[i] > 0 ? 1.f : 0.f;
  return 0;
}

}  // extern "C"
