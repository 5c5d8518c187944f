// Fast ORBvoc.txt parser (C ABI, loaded via ctypes).
//
// The reference's TemplatedVocabulary::loadFromTextFile takes ~10 s to
// parse the 145 MB vocabulary (SURVEY.md §3.1); a Python line parser is
// several times slower still.  This native parser memory-maps the file
// and scans it with strtol/strtod in one pass.
//
// Format (DBoW2 text): header "k L scoring weighting", then one node
// per line: parent_id is_leaf b0..b31 weight.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// First pass: returns number of node lines, writes k and L.
// Returns -1 on error.
long orbvoc_count(const char* path, int* k_out, int* l_out) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  int k = 0, L = 0, s = 0, w = 0;
  if (fscanf(f, "%d %d %d %d", &k, &L, &s, &w) != 4) {
    fclose(f);
    return -1;
  }
  *k_out = k;
  *l_out = L;
  // Count remaining newlines with buffered reads.
  long lines = 0;
  char buf[1 << 16];
  size_t n;
  while ((n = fread(buf, 1, sizeof buf, f)) > 0) {
    for (size_t i = 0; i < n; i++)
      if (buf[i] == '\n') lines++;
  }
  fclose(f);
  return lines;
}

// Second pass: fill preallocated arrays (n = orbvoc_count result).
// parents: int32[n], is_leaf: int32[n], desc: uint8[n*32],
// weights: float64[n].  Returns number of nodes parsed, or -1.
long orbvoc_parse(const char* path, long n, int32_t* parents,
                  int32_t* is_leaf, uint8_t* desc, double* weights) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t size = (size_t)st.st_size;
  char* data = (char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -1;

  const char* p = data;
  const char* end = data + size;
  char* next = nullptr;
  // skip header line
  while (p < end && *p != '\n') p++;
  if (p < end) p++;

  long count = 0;
  while (p < end && count < n) {
    // parent
    long parent = strtol(p, &next, 10);
    if (next == p) break;
    p = next;
    long leaf = strtol(p, &next, 10);
    p = next;
    uint8_t* d = desc + count * 32;
    for (int b = 0; b < 32; b++) {
      long v = strtol(p, &next, 10);
      p = next;
      d[b] = (uint8_t)v;
    }
    double wgt = strtod(p, &next);
    p = next;
    parents[count] = (int32_t)parent;
    is_leaf[count] = (int32_t)leaf;
    weights[count] = wgt;
    count++;
    while (p < end && (*p == '\n' || *p == '\r' || *p == ' ')) p++;
  }
  munmap(data, size);
  return count;
}

}  // extern "C"
