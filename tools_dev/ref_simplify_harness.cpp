// Whole-genome simplify conformance harness (VERDICT r2 item 6).
//
// Builds a GraphUnitigs from a FASTA via the reference library
// (.ref_build/lib/Release/libgatbcore.a), runs the reference
// Simplifications pass schedule (GraphUnitigs.cpp:2010 simplify ->
// Simplifications.cpp:112-215), then dumps every surviving unitig as
//   <sequence> <km mean, %.1f>
// one per line, for set comparison against our debruijn/simplifications.
//
// Build (see tests/test_simplify_reference.py):
//   c++ -std=c++11 -O2 -msse2 -msse4.2 -mpopcnt -DINT128_FOUND \
//     -Wno-invalid-offsetof \
//     -I/root/repo/.ref_build/include -I/root/repo/.ref_build/include/Release \
//     -I/root/reference/gatb-core/src -I/root/reference/gatb-core/thirdparty \
//     ref_simplify_harness.cpp -o ref_simplify_harness \
//     /root/repo/.ref_build/lib/Release/libgatbcore.a \
//     /root/repo/.ref_build/lib/Release/libhdf5.a -ldl -lpthread -lz -lm

#include <gatb/gatb_core.hpp>
#include <gatb/debruijn/impl/GraphUnitigs.hpp>
#include <gatb/debruijn/impl/Simplifications.hpp>

#include <cstdio>
#include <cstring>
#include <set>
#include <string>

using namespace gatb::core::debruijn::impl;

int main(int argc, char* argv[]) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s <fasta> <kmer-size> <abundance-min> "
                "[ops=all|tips|bulges|ec|none]\n", argv[0]);
        return 2;
    }
    const char* input = argv[1];
    int k = atoi(argv[2]);
    int amin = atoi(argv[3]);
    const char* ops = (argc > 4) ? argv[4] : "all";

    try {
        GraphUnitigsTemplate<32> graph = GraphUnitigsTemplate<32>::create(
            "-in %s -kmer-size %d -abundance-min %d -verbose 0 "
            "-nb-cores 1 -out %s.h5",
            input, k, amin, input);

        if (strcmp(ops, "none") != 0) {
            Simplifications<GraphUnitigsTemplate<32>, NodeGU, EdgeGU>
                simp(&graph, 1, 1);
            if (strcmp(ops, "all") != 0) {
                simp._doTipRemoval = strcmp(ops, "tips") == 0;
                simp._doBulgeRemoval = strcmp(ops, "bulges") == 0;
                simp._doECRemoval = strcmp(ops, "ec") == 0;
            }
            simp.simplify();
        }

        std::set<unsigned int> seen;
        GraphIterator<NodeGU> it = graph.iterator();
        for (it.first(); !it.isDone(); it.next()) {
            NodeGU node = it.item();
            if (seen.count(node.unitig)) continue;
            seen.insert(node.unitig);
            bool il = false, ir = false;
            std::string seq = graph.unitigSequence(node, il, ir);
            double mean = graph.unitigMeanAbundance(node);
            printf("%s %.1f\n", seq.c_str(), mean);
        }
    } catch (gatb::core::system::Exception& e) {
        fprintf(stderr, "EXCEPTION: %s\n", e.getMessage());
        return 1;
    }
    return 0;
}
