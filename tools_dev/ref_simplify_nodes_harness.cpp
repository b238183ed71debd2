// Companion to ref_simplify_harness.cpp: plain GraphTemplate variant
// (the template our crafted-motif tests conform to —
// TestSimplifications.cpp uses Graph::simplify). Dumps every surviving
// (non-deleted) node kmer string after simplify, one per line, so the
// surviving-kmer SET can be compared against ours and against the
// GraphUnitigs variant.
//
// Build: same command as ref_simplify_harness.cpp (see that header).

#include <gatb/gatb_core.hpp>

#include <cstdio>
#include <string>

int main(int argc, char* argv[]) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s <fasta> <kmer-size> <abundance-min> "
                "[simplify=1]\n", argv[0]);
        return 2;
    }
    const char* input = argv[1];
    int k = atoi(argv[2]);
    int amin = atoi(argv[3]);
    int do_simplify = (argc > 4) ? atoi(argv[4]) : 1;

    try {
        Graph graph = Graph::create(
            "-in %s -kmer-size %d -abundance-min %d -verbose 0 "
            "-nb-cores 1 -out %s.nodes.h5",
            input, k, amin, input);

        if (do_simplify) graph.simplify(1, false);

        GraphIterator<Node> it = graph.iterator();
        for (it.first(); !it.isDone(); it.next()) {
            if (graph.isNodeDeleted(it.item())) continue;
            printf("%s\n", graph.toString(it.item()).c_str());
        }
    } catch (gatb::core::system::Exception& e) {
        fprintf(stderr, "EXCEPTION: %s\n", e.getMessage());
        return 1;
    }
    return 0;
}
