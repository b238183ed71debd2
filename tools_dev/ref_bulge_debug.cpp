// Debug harness: replicate ONE removeBulges pass decision-by-decision
// against the reference library, printing every candidate (its first
// kmer, pathLen, HMCP outcome, coverages) so our vectorized
// implementation can be diffed decision-by-decision.
//
// Build: same flags as ref_simplify_harness.cpp.

#include <gatb/gatb_core.hpp>
#include <gatb/debruijn/impl/GraphUnitigs.hpp>
#include <gatb/debruijn/impl/Simplifications.hpp>

#include <cstdio>
#include <string>

using namespace gatb::core::debruijn::impl;
using namespace gatb::core::tools::misc;

typedef GraphUnitigsTemplate<32> GraphU;

struct BulgeDebugger : public Simplifications<GraphU, NodeGU, EdgeGU> {
    BulgeDebugger(GraphU* g) :
        Simplifications<GraphU, NodeGU, EdgeGU>(g, 1, 0) {}

    void debugBulges() {
        unsigned int k = _graph.getKmerSize();
        unsigned int maxBulgeLength = std::max(
            (unsigned int)((double)k * _bulgeLen_kMult),
            (unsigned int)(k + _bulgeLen_kAdd));
        unsigned int backtrackingLimit = k + _bulgeAltPath_kAdd;
        double altPathCovMult = _bulgeAltPath_covMult;

        GraphIterator<NodeGU> it = _graph.GraphU::iterator();
        for (it.first(); !it.isDone(); it.next()) {
            NodeGU node = it.item();
            if (_graph.isNodeDeleted(node)) continue;
            unsigned inDegree = _graph.indegree(node),
                     outDegree = _graph.outdegree(node);
            for (Direction dir = DIR_OUTCOMING; dir < DIR_END;
                 dir = (Direction)((int)dir + 1)) {
                if (!((outDegree >= 2 && dir == DIR_OUTCOMING) ||
                      (inDegree >= 2 && dir == DIR_INCOMING)))
                    continue;
                GraphVector<EdgeGU> neighbors =
                    _graph.neighborsEdge(node, dir);
                for (unsigned int i = 0; i < neighbors.size(); i++) {
                    if (node == neighbors[i].to) continue;
                    if (_graph.isNodeDeleted(neighbors[i].to)) continue;
                    NodeGU simplePathStart = neighbors[i].to;
                    Direction simplePathDir = dir;
                    unsigned int pathLen = _graph.simplePathLength(
                        simplePathStart, simplePathDir);
                    bool isShort = (k + pathLen <= maxBulgeLength);
                    if (!isShort || pathLen == 0) continue;
                    NodeGU lastNode = _graph.simplePathLastNode(
                        simplePathStart, simplePathDir);
                    GraphVector<EdgeGU> outneighbors =
                        _graph.neighborsEdge(lastNode, dir);
                    if (outneighbors.size() == 0) continue;
                    NodeGU endNode = outneighbors[0].to;
                    bool isDoublyConnected =
                        (dir == DIR_OUTCOMING &&
                         _graph.indegree(endNode) > 1) ||
                        (dir == DIR_INCOMING &&
                         _graph.outdegree(endNode) > 1);
                    if (!isDoublyConnected) {
                        printf("CAND %s dir=%d pathlen=%u NOTDC\n",
                               _graph.toString(simplePathStart).c_str(),
                               (int)dir, pathLen);
                        continue;
                    }
                    unsigned int maxlen = std::max(
                        (unsigned int)(pathLen * 1.1),
                        (unsigned int)(pathLen + 3));
                    double mean_most = 0;
                    int success;
                    NodeGU startNode = node;
                    Path_t<NodeGU> p;
                    this->heuristic_most_covered_path(
                        dir, startNode, endNode, maxlen, success,
                        mean_most, p, backtrackingLimit,
                        &(neighbors[i].to), true, false);
                    double pathCov = _graph.simplePathMeanAbundance(
                        simplePathStart, simplePathDir);
                    bool isBulge = success == 1 &&
                        pathCov <= mean_most * altPathCovMult;
                    printf("CAND %s dir=%d pathlen=%u end=%s succ=%d "
                           "alt=%.4f cov=%.4f bulge=%d\n",
                           _graph.toString(simplePathStart).c_str(),
                           (int)dir, pathLen,
                           _graph.toString(endNode).c_str(), success,
                           mean_most, pathCov, (int)isBulge);
                }
            }
        }
    }
};

int main(int argc, char* argv[]) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s <fasta> <k> <amin>\n", argv[0]);
        return 2;
    }
    try {
        GraphU graph = GraphU::create(
            "-in %s -kmer-size %d -abundance-min %d -verbose 0 "
            "-nb-cores 1 -out %s.dbg.h5",
            argv[1], atoi(argv[2]), atoi(argv[3]), argv[1]);
        BulgeDebugger dbg(&graph);
        dbg.debugBulges();
    } catch (gatb::core::system::Exception& e) {
        fprintf(stderr, "EXCEPTION: %s\n", e.getMessage());
        return 1;
    }
    return 0;
}
