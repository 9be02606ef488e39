"""Topology error-code registry (SURVEY.md §2.A R14).

One code per defect class in BASELINE.json:6's authoritative taxonomy:
free-standing surfaces, edge intersections, overlapping/duplicate
boundaries, invalid interiors — plus the invalid-edge (zero-length) case
the builder rejects at insert time.

NOTE (SURVEY.md §0/§7 risk #3): the reference snapshot at /root/reference/
was empty at survey time, so the *verbatim* enum spellings of
de.interactive_instruments.etf.bsxm.topox.TopologyErrorType could not be
read. These names follow the BASELINE.json:6 families; if the snapshot is
ever populated, rename here — this file is the single source of truth for
codes, so parity renames are one-line diffs.
"""

from __future__ import annotations

# same undirected edge claimed by >2 directed edges
DUPLICATE_BOUNDARY = "DUPLICATE_BOUNDARY"
# exactly two directed edges traverse the same boundary in the SAME
# direction → the two surfaces overlap rather than abut
OVERLAPPING_BOUNDARY = "OVERLAPPING_BOUNDARY"
# two edges of different rings meet improperly (crossing, collinear
# overlap, or T-junction)
EDGE_INTERSECTION = "EDGE_INTERSECTION"
# two edges of the SAME ring meet improperly (bowtie / figure-8)
RING_SELF_INTERSECTION = "RING_SELF_INTERSECTION"
# connected component of the edge graph detached from the main body
FREE_STANDING_SURFACE = "FREE_STANDING_SURFACE"
# interior ring whose boundary is shared with no other surface → hole with
# nothing filling it
EMPTY_INTERIOR = "EMPTY_INTERIOR"
# ring wound the wrong way (exterior must be CCW, interior CW)
RING_ORIENTATION = "RING_ORIENTATION"
# zero-length edge (consecutive duplicate vertex)
INVALID_EDGE = "INVALID_EDGE"

ALL_CODES = (
    DUPLICATE_BOUNDARY,
    OVERLAPPING_BOUNDARY,
    EDGE_INTERSECTION,
    RING_SELF_INTERSECTION,
    FREE_STANDING_SURFACE,
    EMPTY_INTERIOR,
    RING_ORIENTATION,
    INVALID_EDGE,
)

#: family grouping per BASELINE.json:6
FAMILIES = {
    "overlapping_duplicate_boundary": (DUPLICATE_BOUNDARY, OVERLAPPING_BOUNDARY),
    "edge_intersection": (EDGE_INTERSECTION, RING_SELF_INTERSECTION),
    "free_standing_surface": (FREE_STANDING_SURFACE,),
    "invalid_interior": (EMPTY_INTERIOR, RING_ORIENTATION),
    "invalid_edge": (INVALID_EDGE,),
}
