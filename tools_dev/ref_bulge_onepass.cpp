// Run the REAL Simplifications::removeBulges() for N passes on a fresh
// GraphUnitigs, then dump surviving unitigs — ground truth to diff both
// against our implementation and against ref_bulge_debug's replica.

#include <gatb/gatb_core.hpp>
#include <gatb/debruijn/impl/GraphUnitigs.hpp>
#include <gatb/debruijn/impl/Simplifications.hpp>

#include <cstdio>
#include <set>
#include <string>

using namespace gatb::core::debruijn::impl;

typedef GraphUnitigsTemplate<32> GraphU;

int main(int argc, char* argv[]) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s <fasta> <k> <amin> <npasses>\n",
                argv[0]);
        return 2;
    }
    int npasses = atoi(argv[4]);
    try {
        GraphU graph = GraphU::create(
            "-in %s -kmer-size %d -abundance-min %d -verbose 0 "
            "-nb-cores 1 -out %s.1p.h5",
            argv[1], atoi(argv[2]), atoi(argv[3]), argv[1]);
        Simplifications<GraphU, NodeGU, EdgeGU> simp(&graph, 1, 0);
        for (int i = 0; i < npasses; i++) {
            unsigned long n = simp.removeBulges();
            fprintf(stderr, "pass %d: visible removed %lu\n", i + 1, n);
        }
        std::set<unsigned int> seen;
        GraphIterator<NodeGU> it = graph.iterator();
        for (it.first(); !it.isDone(); it.next()) {
            NodeGU node = it.item();
            if (seen.count(node.unitig)) continue;
            seen.insert(node.unitig);
            bool il = false, ir = false;
            printf("%s\n", graph.unitigSequence(node, il, ir).c_str());
        }
    } catch (gatb::core::system::Exception& e) {
        fprintf(stderr, "EXCEPTION: %s\n", e.getMessage());
        return 1;
    }
    return 0;
}
