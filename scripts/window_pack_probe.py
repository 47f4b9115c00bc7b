"""Host probe: K' for w-chunk-window slot packing vs production layouts.

Production grids: solver ng=1 K'=25, GNN ng=8 K'=23 at heat res=24/48
(max row degree 13). Round-1l showed w=3 with tile-coordinated bases
reaches K'=13 for ng=1. Question here: what does a w-window packer give
as a REPLACEMENT for lane_groups on the GNN grid, and what are the
resulting Qg / onehot sizes (the kernel-cost drivers)?
"""
import sys
import time

import numpy as np
import scipy.sparse as sp

from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.kernels.gsel import build_gsel

LANE = 128
TILE = 128


def pack_window(a, w, group=16, base_mode="first"):
    """Tile-coordinated greedy w-window packer (host prototype).

    Each slot row k of a tile has ONE base chunk q_k (shared by all 128
    rows); an edge (row r, chunk q, lane l) may sit in slot (k, r) iff
    q_k <= q < q_k + w. Greedy: per tile, rows processed together,
    edges in chunk order, first-fit over existing slot rows; new slot
    row base = current chunk (base_mode='first') or current chunk-(w-1)
    ('mid' variants tried below).
    Returns per-tile K list and global K'."""
    a = sp.csr_matrix(a)
    a.sort_indices()
    n = a.shape[0]
    coo = a.tocoo()
    row, col = coo.row, coo.col
    tid = row // TILE
    n_tiles = -(-n // TILE)
    n_steps = -(-n_tiles // group)
    gid = tid // group
    chunk = col // LANE
    # group window base (aligned 8) as production does
    gbase = np.full(n_steps, np.iinfo(np.int64).max)
    np.minimum.at(gbase, gid, chunk)
    occ = np.zeros(n_steps, bool)
    occ[gid] = True
    gbase = np.where(occ, gbase & ~7, 0)
    ghi = np.zeros(n_steps, np.int64)
    np.maximum.at(ghi, gid, chunk)
    qg = int((np.where(occ, ghi - gbase, 0)).max()) + 1
    qg = -(-qg // 8) * 8

    relq = chunk - gbase[gid]
    rint = row % TILE
    ks = []
    order = np.lexsort((col, rint, tid))
    t_o, q_o, r_o = tid[order], relq[order], rint[order]
    slot_of = np.zeros(len(order), np.int64)
    start = 0
    for t in range(n_tiles):
        end = start
        while end < len(t_o) and t_o[end] == t:
            end += 1
        # edges of this tile, already sorted by (row, chunk); process in
        # chunk-major order across rows for base coordination
        idx = np.arange(start, end)
        idx = idx[np.lexsort((r_o[idx], q_o[idx]))]
        bases = []  # slot-row bases
        occrows = []  # per slot row: boolean occupancy [TILE]
        for i in idx:
            q, r = q_o[i], r_o[i]
            placed = False
            for k in range(len(bases)):
                if bases[k] <= q < bases[k] + w and not occrows[k][r]:
                    occrows[k][r] = True
                    slot_of[i] = k
                    placed = True
                    break
            if not placed:
                bases.append(q if base_mode == "first" else max(0, q - (w - 1) // 2))
                occrows.append(np.zeros(TILE, bool))
                occrows[-1][r] = True
                slot_of[i] = len(bases) - 1
        ks.append(len(bases))
        start = end
    return np.array(ks), qg


def main():
    for res in (24, 48) if len(sys.argv) < 2 else (int(sys.argv[1]),):
        nodes, elems = unit_box_tet(res, res, res)
        a = sp.csr_matrix(laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems)))
        perm = rcm_permutation(a)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        n = ap.shape[0]
        deg = np.diff(ap.indptr).max()
        print(f"res={res} n={n} nnz={ap.nnz} maxdeg={deg}")
        for ng in (1, 8):
            g = build_gsel(ap, lane_groups=ng)
            if g is not None:
                print(f"  production ng={ng}: K'={g.k_width} Qg={g.q_chunks} "
                      f"onehot_cols={ng*g.q_chunks} slots={g.slots/1e6:.2f}M")
        for w in (1, 2, 3, 4):
            t0 = time.time()
            ks, qg = pack_window(ap, w)
            print(f"  window w={w}: K'={ks.max()} (mean {ks.mean():.1f}) "
                  f"Qg={qg} [{time.time()-t0:.1f}s]")


if __name__ == "__main__":
    main()
