// Oracle driver for golden parity tests.
//
// Links the UNMODIFIED reference implementation
// (/root/reference/DatabaseProject.cpp) and exposes its four operators as a
// scriptable CLI so the TPU engine can be diffed against the original
// byte-for-byte.  This file is new code (the reference's own driver,
// main.cpp, is a fixed benchmark that seeds from time(0) and hardcodes its
// filenames — unusable as a deterministic oracle).
//
// Usage:
//   oracle mergesort  <infile> <field-char> <nmem_blocks> <outfile>
//   oracle elimdup    <infile> <field-char> <nmem_blocks> <outfile>
//   oracle mergejoin  <in1> <in2> <field-char> <nmem_blocks> <outfile>
//   oracle hashjoin   <in1> <in2> <field-char> <nmem_blocks> <outfile>
//
// Prints one JSON line of the reference's stats-out parameters.  Must be run
// in a scratch directory: the reference creates/deletes segment<N>.bin files
// in the CWD (DatabaseProject.cpp:653-657), and MergeJoin hardcodes its
// dedup intermediates 1outfile.bin/2outfile.bin (DatabaseProject.cpp:385-386).
#include "DatabaseProject.h"
#include <cstdio>
#include <cstring>
#include <string>

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: oracle <op> <args...>\n");
    return 2;
  }
  std::string op = argv[1];
  unsigned int nsorted_segs = 0, npasses = 0, nunique = 0, nres = 0, nios = 0;
  block_t *buffer = NULL;  // every operator allocates its own (ref behavior)

  if (op == "mergesort" && argc == 6) {
    char out[512];
    std::strncpy(out, argv[5], sizeof(out) - 1);
    MergeSort(argv[2], (unsigned char)argv[3][0], buffer,
              (unsigned)atoi(argv[4]), out, &nsorted_segs, &npasses, &nios);
    // MergeSort writes its result to segment<K>.bin and strcpy's that name
    // into the outfile buffer (DatabaseProject.cpp:375-376); rename it to
    // the path the caller asked for.
    std::rename(out, argv[5]);
    std::printf("{\"nsorted_segs\": %u, \"npasses\": %u, \"nios\": %u}\n",
                nsorted_segs, npasses, nios);
  } else if (op == "elimdup" && argc == 6) {
    EliminateDuplicates(argv[2], (unsigned char)argv[3][0], buffer,
                        (unsigned)atoi(argv[4]), argv[5], &nunique, &nios);
    std::printf("{\"nunique\": %u, \"nios\": %u}\n", nunique, nios);
  } else if (op == "mergejoin" && argc == 7) {
    MergeJoin(argv[2], argv[3], (unsigned char)argv[4][0], buffer,
              (unsigned)atoi(argv[5]), argv[6], &nres, &nios);
    std::printf("{\"nres\": %u, \"nios\": %u}\n", nres, nios);
  } else if (op == "hashjoin" && argc == 7) {
    HashJoin(argv[2], argv[3], (unsigned char)argv[4][0], buffer,
             (unsigned)atoi(argv[5]), argv[6], &nres, &nios);
    std::printf("{\"nres\": %u, \"nios\": %u}\n", nres, nios);
  } else {
    std::fprintf(stderr, "bad op/arity: %s\n", op.c_str());
    return 2;
  }
  return 0;
}
