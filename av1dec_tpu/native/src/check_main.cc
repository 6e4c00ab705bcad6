// Sanitizer check driver: decode an IVF file through the native
// entropy front-half under ASan/UBSan/TSan builds (SURVEY §5.2).
//
// Usage: av1dec_check <file.ivf> [threads]
// Exits 0 on success, 1 on any parse failure.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* av1n_create();
void av1n_destroy(void*);
int av1n_parse_tu(void*, const uint8_t*, size_t);
void av1n_set_threads(void*, int);
const char* av1n_last_error(void*);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s file.ivf [threads]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) {
    perror("open");
    return 2;
  }
  uint8_t hdr[32];
  if (fread(hdr, 1, 32, f) != 32 || memcmp(hdr, "DKIF", 4) != 0) {
    fprintf(stderr, "not an IVF file\n");
    fclose(f);
    return 2;
  }
  void* h = av1n_create();
  if (argc > 2) av1n_set_threads(h, atoi(argv[2]));
  int frames = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint8_t fh[12];
    if (fread(fh, 1, 12, f) != 12) break;
    uint32_t sz = fh[0] | (fh[1] << 8) | (fh[2] << 16) |
                  ((uint32_t)fh[3] << 24);
    buf.resize(sz);
    if (fread(buf.data(), 1, sz, f) != sz) break;
    int rc = av1n_parse_tu(h, buf.data(), sz);
    if (rc < 0) {
      fprintf(stderr, "parse error: %s\n", av1n_last_error(h));
      av1n_destroy(h);
      fclose(f);
      return 1;
    }
    frames += rc;
  }
  av1n_destroy(h);
  fclose(f);
  printf("ok %d frames\n", frames);
  return 0;
}
