// Native N-Triples graph builder: the framework's data-loading hot path.
//
// Replaces the reference's two Python passes over all raw triple lines
// (vocab build + edge-list build, reference graphs/graph.py:24-69 — hot
// loop #1 in SURVEY.md §3.1) with a single-allocation C++ pipeline:
//
//   read file -> lowercase in place -> split lines/triples ->
//   unique-line count -> sorted node/relation vocabularies ->
//   doubled (2r / 2r+1) int32 edge arrays -> rdf:type pair extraction
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All returned
// memory hangs off an opaque handle freed by ntg_free().
//
// Parity notes vs the Python reference path (graphs/nt.py):
// - lines are truncated by two chars and split on the first two spaces;
// - lowercasing is ASCII-only (Python str.lower() also maps non-ASCII
//   codepoints; RDF term names are ASCII in practice — the Python path
//   remains the semantic reference and tests assert agreement on data);
// - blank/short lines are skipped; duplicate lines still produce edges;
// - num_edges counts unique raw lines (reference graph.py:29,39).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr const char* kTypePred1 = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>";
constexpr const char* kTypePred2 = "<type>";

struct Triple {
  std::string_view s, p, o;
};

struct NtGraph {
  std::string buffer;                 // lowercased file contents
  std::vector<Triple> triples;
  int64_t num_unique_lines = 0;

  std::vector<std::string_view> nodes;      // sorted unique
  std::vector<std::string_view> relations;  // sorted unique, minus type preds

  std::vector<int32_t> edge_src, edge_dst, edge_type;

  // rdf:type pairs as indices into `type_subjects` / `type_objects`
  std::vector<std::string_view> type_subjects, type_objects;

  // flattened string tables for the Python side
  std::string nodes_blob, rels_blob, types_blob;
  std::vector<int64_t> nodes_offsets, rels_offsets, types_offsets;
};

void build_blob(const std::vector<std::string_view>& items, std::string* blob,
                std::vector<int64_t>* offsets) {
  offsets->clear();
  offsets->reserve(items.size() + 1);
  size_t total = 0;
  for (auto& it : items) total += it.size();
  blob->clear();
  blob->reserve(total);
  offsets->push_back(0);
  for (auto& it : items) {
    blob->append(it.data(), it.size());
    offsets->push_back(static_cast<int64_t>(blob->size()));
  }
}

}  // namespace

extern "C" {

// Parse + build. Returns nullptr on I/O failure.
void* ntg_parse(const char* path) {
  auto* g = new NtGraph();
  {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
      delete g;
      return nullptr;
    }
    f.seekg(0, std::ios::end);
    g->buffer.resize(static_cast<size_t>(f.tellg()));
    f.seekg(0);
    f.read(g->buffer.data(), static_cast<std::streamsize>(g->buffer.size()));
  }
  // ASCII lowercase in place
  for (char& c : g->buffer)
    if (c >= 'A' && c <= 'Z') c += 32;

  // split lines; count unique raw lines; split triples
  std::unordered_set<std::string_view> unique_lines;
  std::string_view buf(g->buffer);
  size_t pos = 0;
  while (pos <= buf.size()) {
    size_t nl = buf.find('\n', pos);
    std::string_view line = (nl == std::string_view::npos)
                                ? buf.substr(pos)
                                : buf.substr(pos, nl - pos);
    pos = (nl == std::string_view::npos) ? buf.size() + 1 : nl + 1;
    if (nl == std::string_view::npos && line.empty()) break;
    unique_lines.insert(line);
    // reference: line[:-2].split(" ", maxsplit=2)
    if (line.size() < 2) continue;
    std::string_view body = line.substr(0, line.size() - 2);
    size_t sp1 = body.find(' ');
    if (sp1 == std::string_view::npos) continue;
    size_t sp2 = body.find(' ', sp1 + 1);
    if (sp2 == std::string_view::npos) continue;
    Triple t{body.substr(0, sp1), body.substr(sp1 + 1, sp2 - sp1 - 1),
             body.substr(sp2 + 1)};
    g->triples.push_back(t);
  }
  // (the loop breaks on the empty final segment after a trailing "\n", so
  // unique_lines holds exactly Python's set(content.splitlines()))
  g->num_unique_lines = static_cast<int64_t>(unique_lines.size());

  // vocabularies
  std::unordered_set<std::string_view> node_set, pred_set;
  node_set.reserve(g->triples.size());
  for (auto& t : g->triples) {
    node_set.insert(t.s);
    node_set.insert(t.o);
    pred_set.insert(t.p);
  }
  pred_set.erase(std::string_view(kTypePred1));
  pred_set.erase(std::string_view(kTypePred2));

  g->nodes.assign(node_set.begin(), node_set.end());
  std::sort(g->nodes.begin(), g->nodes.end());
  g->relations.assign(pred_set.begin(), pred_set.end());
  std::sort(g->relations.begin(), g->relations.end());

  std::unordered_map<std::string_view, int32_t> node_id, rel_id;
  node_id.reserve(g->nodes.size() * 2);
  for (size_t i = 0; i < g->nodes.size(); ++i) node_id[g->nodes[i]] = (int32_t)i;
  for (size_t i = 0; i < g->relations.size(); ++i) rel_id[g->relations[i]] = (int32_t)i;

  // doubled edge arrays + type pairs
  g->edge_src.reserve(g->triples.size() * 2);
  g->edge_dst.reserve(g->triples.size() * 2);
  g->edge_type.reserve(g->triples.size() * 2);
  std::string_view type_pred(kTypePred1);
  for (auto& t : g->triples) {
    if (t.p == type_pred) {
      g->type_subjects.push_back(t.s);
      g->type_objects.push_back(t.o);
    }
    auto r = rel_id.find(t.p);
    if (r == rel_id.end()) continue;
    auto si = node_id.find(t.s);
    auto oi = node_id.find(t.o);
    if (si == node_id.end() || oi == node_id.end()) continue;
    g->edge_src.push_back(si->second);
    g->edge_dst.push_back(oi->second);
    g->edge_type.push_back(2 * r->second);
    g->edge_src.push_back(oi->second);
    g->edge_dst.push_back(si->second);
    g->edge_type.push_back(2 * r->second + 1);
  }

  build_blob(g->nodes, &g->nodes_blob, &g->nodes_offsets);
  build_blob(g->relations, &g->rels_blob, &g->rels_offsets);
  // type pairs interleaved: s0, o0, s1, o1, ...
  std::vector<std::string_view> interleaved;
  interleaved.reserve(g->type_subjects.size() * 2);
  for (size_t i = 0; i < g->type_subjects.size(); ++i) {
    interleaved.push_back(g->type_subjects[i]);
    interleaved.push_back(g->type_objects[i]);
  }
  build_blob(interleaved, &g->types_blob, &g->types_offsets);
  return g;
}

void ntg_free(void* h) { delete static_cast<NtGraph*>(h); }

int64_t ntg_num_nodes(void* h) { return static_cast<NtGraph*>(h)->nodes.size(); }
int64_t ntg_num_relations(void* h) { return static_cast<NtGraph*>(h)->relations.size(); }
int64_t ntg_num_edges_unique(void* h) { return static_cast<NtGraph*>(h)->num_unique_lines; }
int64_t ntg_num_edge_entries(void* h) { return static_cast<NtGraph*>(h)->edge_src.size(); }
int64_t ntg_num_type_pairs(void* h) { return static_cast<NtGraph*>(h)->type_subjects.size(); }

const int32_t* ntg_edge_src(void* h) { return static_cast<NtGraph*>(h)->edge_src.data(); }
const int32_t* ntg_edge_dst(void* h) { return static_cast<NtGraph*>(h)->edge_dst.data(); }
const int32_t* ntg_edge_type(void* h) { return static_cast<NtGraph*>(h)->edge_type.data(); }

const char* ntg_nodes_blob(void* h) { return static_cast<NtGraph*>(h)->nodes_blob.data(); }
const int64_t* ntg_nodes_offsets(void* h) { return static_cast<NtGraph*>(h)->nodes_offsets.data(); }
const char* ntg_rels_blob(void* h) { return static_cast<NtGraph*>(h)->rels_blob.data(); }
const int64_t* ntg_rels_offsets(void* h) { return static_cast<NtGraph*>(h)->rels_offsets.data(); }
const char* ntg_types_blob(void* h) { return static_cast<NtGraph*>(h)->types_blob.data(); }
const int64_t* ntg_types_offsets(void* h) { return static_cast<NtGraph*>(h)->types_offsets.data(); }

}  // extern "C"
