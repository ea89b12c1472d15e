"""Partition tables and global<->stacked conversions."""
import numpy as np
import pytest

from tpcg.parallel import make_partition, make_varsize_partition


def test_eqsize_geometry():
    # M=3, W=6, OL=2: N0 = 16, N = 20, short_w = 5, sdsz = 10
    part = make_partition(3, 6, 2)
    assert part.N == 20 and part.short_w == 5 and part.sdsz == 10
    assert part.nsubd == 9
    # boxes overlap by 2*OL+1 = 5 points
    assert part.row0[3] - part.row0[0] == 5
    p = 4  # middle subdomain (si=1, sj=1)
    assert part.row0[p] == 5 and part.col0[p] == 5
    # unique ranges (strict reference parity):
    np.testing.assert_array_equal(part.urow[0], [0, 5])     # si=0
    np.testing.assert_array_equal(part.urow[3], [2, 7])     # si=1
    np.testing.assert_array_equal(part.urow[6], [2, 9])     # si=2 (last)
    # last box must end exactly at N
    assert part.row0[6] + part.sdsz == part.N


def test_eqsize_unique_quirks():
    """The reference's unique regions have a gap between subdomains 0 and 1
    and drop the last global row (SURVEY quirks) -- strict parity keeps
    them, the gapless variant tiles exactly."""
    part = make_partition(2, 6, 2, strict_parity=True)
    covered = np.zeros(part.N)
    for p in [0, 2]:  # column 0 subdomains (si=0, si=1)
        r0 = part.row0[p]
        covered[r0 + part.urow[p, 0]: r0 + part.urow[p, 1]] += 1
    assert covered[part.short_w] == 0            # gap row
    assert covered[-1] == 0                      # dropped last row
    assert covered.max() == 1                    # never doubly owned

    part2 = make_partition(2, 6, 2, strict_parity=False)
    covered = np.zeros(part2.N)
    for p in [0, 2]:
        r0 = part2.row0[p]
        covered[r0 + part2.urow[p, 0]: r0 + part2.urow[p, 1]] += 1
    np.testing.assert_array_equal(covered, np.ones(part2.N))


def test_stacked_roundtrip_and_consistency_check():
    part = make_partition(2, 5, 1)
    rng = np.random.default_rng(0)
    g = rng.standard_normal((part.N, part.N))
    x = part.to_stacked(g)
    g2 = part.to_global(x, check=True)
    np.testing.assert_array_equal(g, g2)
    # corrupt one overlap copy -> the invariant check must fire
    x_bad = x.copy()
    p = 3
    x_bad[p, 0, 0] += 1.0
    with pytest.raises(AssertionError):
        part.to_global(x_bad, check=True)


def test_varsize_tables():
    # N=14, M=3, OL=1: n=13, widths [4,4,5]
    subs = make_varsize_partition(3, 14, 1)
    assert len(subs) == 9
    s0 = subs[0]          # si=0, sj=0: no leading overlap
    assert s0["row0"] == 0 and s0["nv"] == 4 + 1 + 1   # w + Lie + 1
    s4 = subs[4]          # si=1, sj=1: overlap on all sides
    assert s4["row0"] == 4 - 1 and s4["nv"] == 1 + 4 + 1 + 1
    s8 = subs[8]          # last: remainder width 5, no trailing overlap
    assert s8["nv"] == 1 + 5 + 1
    # unique regions cover [0, N) per row exactly (varsize has no gaps
    # except the reference's last-row handling, which keeps row N-1 here)
    covered = np.zeros(14)
    for si in range(3):
        s = subs[si * 3]
        covered[s["row0"] + s["urow"][0]: s["row0"] + s["urow"][1]] += 1
    np.testing.assert_array_equal(covered, np.ones(14))
