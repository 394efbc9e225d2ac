"""Taxonomy tools: NCBI tree loading, lineage printing, LCA, filtering.

reference: tax/ package — TaxTree.java:24 (nodes.dmp tree), GiToNcbi,
PrintTaxonomy, FindAncestor, FilterByTaxa, SortByTaxa
(SURVEY §2.10). Works from standard NCBI dump files (nodes.dmp,
names.dmp).
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Set

from ..io import fastx
from ..utils.args import Args


class TaxTree:
    """reference: tax/TaxTree.java — parent/rank arrays from nodes.dmp
    plus scientific names from names.dmp."""

    def __init__(self):
        self.parent: Dict[int, int] = {}
        self.rank: Dict[int, str] = {}
        self.name: Dict[int, str] = {}
        self.name_to_id: Dict[str, int] = {}

    @classmethod
    def load(cls, nodes_path: str,
             names_path: Optional[str] = None) -> "TaxTree":
        t = cls()
        with fastx.xopen(nodes_path, "rt") as fh:
            for line in fh:
                f = [x.strip() for x in line.split("|")]
                if len(f) < 3:
                    continue
                tid, par, rank = int(f[0]), int(f[1]), f[2]
                t.parent[tid] = par
                t.rank[tid] = rank
        if names_path:
            with fastx.xopen(names_path, "rt") as fh:
                for line in fh:
                    f = [x.strip() for x in line.split("|")]
                    if len(f) >= 4 and f[3] == "scientific name":
                        t.name[int(f[0])] = f[1]
                        t.name_to_id[f[1].lower()] = int(f[0])
        return t

    def lineage(self, tid: int) -> List[int]:
        out = []
        seen = set()
        while tid in self.parent and tid not in seen:
            out.append(tid)
            seen.add(tid)
            par = self.parent[tid]
            if par == tid:
                break
            tid = par
        return out

    def lca(self, tids: List[int]) -> int:
        """reference: tax/FindAncestor.java."""
        if not tids:
            return 1
        common: Optional[List[int]] = None
        for tid in tids:
            lin = self.lineage(tid)
            if common is None:
                common = lin
            else:
                sl = set(lin)
                common = [x for x in common if x in sl]
        return common[0] if common else 1

    def is_descendant(self, tid: int, ancestor: int) -> bool:
        return ancestor in self.lineage(tid)

    def resolve(self, token: str) -> Optional[int]:
        try:
            return int(token)
        except ValueError:
            return self.name_to_id.get(token.lower())


def printtaxonomy(argv: List[str]) -> int:
    """reference: tax/PrintTaxonomy.java + sh/printtaxonomy.sh."""
    args = Args.parse(argv)
    nodes = args.get("tree", "nodes")
    names = args.get("names")
    query = args.get("id", "name") or (args.positional[0]
                                       if args.positional else None)
    if nodes is None or query is None:
        print("Usage: printtaxonomy nodes=<nodes.dmp> [names=<names.dmp>]"
              " id=<taxid|name>", file=sys.stderr)
        return 1
    t = TaxTree.load(nodes, names)
    tid = t.resolve(query)
    if tid is None:
        print(f"Could not resolve {query!r}", file=sys.stderr)
        return 1
    for x in t.lineage(tid):
        nm = t.name.get(x, "")
        print(f"{t.rank.get(x, '?')}\t{x}\t{nm}")
    return 0


def findancestor(argv: List[str]) -> int:
    args = Args.parse(argv)
    nodes = args.get("tree", "nodes")
    ids = args.get("ids", "id")
    names = args.get("names")
    if nodes is None or ids is None:
        print("Usage: findancestor nodes=<nodes.dmp> ids=1234,5678",
              file=sys.stderr)
        return 1
    t = TaxTree.load(nodes, names)
    tids = [t.resolve(x) for x in ids.split(",")]
    tids = [x for x in tids if x is not None]
    anc = t.lca(tids)
    print(f"{anc}\t{t.rank.get(anc, '?')}\t{t.name.get(anc, '')}")
    return 0


def filterbytaxa(argv: List[str]) -> int:
    """Keep sequences whose header taxid descends from the given node
    (reference: tax/FilterByTaxa.java). Headers carry 'tid|<n>' or
    'taxid=<n>' markers, or a name resolvable via names.dmp."""
    args = Args.parse(argv)
    nodes = args.get("tree", "nodes")
    names = args.get("names")
    inp = args.get("in")
    out = args.get("out")
    node = args.get("taxa", "id")
    include = args.get_bool("include", default=True)
    if None in (nodes, inp, out, node):
        print("Usage: filterbytaxa nodes= in= out= taxa=<taxid>",
              file=sys.stderr)
        return 1
    t = TaxTree.load(nodes, names)
    target = t.resolve(node)

    def header_tid(h: str) -> Optional[int]:
        for tok in h.replace("|", " ").replace("=", " ").split():
            pass
        import re as _re
        m = _re.search(r"(?:tid\||taxid[= ]|tax_id[= ])(\d+)", h)
        if m:
            return int(m.group(1))
        return None

    kept = 0
    fmt = fastx.sniff_format(inp)

    def gen():
        nonlocal kept
        for rec in fastx.read_seqs(inp):
            tid = header_tid(rec.id)
            hit = tid is not None and t.is_descendant(tid, target)
            if hit == include:
                kept += 1
                yield rec

    if fmt == "fasta":
        fastx.write_fasta(out, gen())
    else:
        fastx.write_fastq(out, gen())
    sys.stderr.write(f"Kept:\t{kept}\n")
    return 0


TOOLS = dict(printtaxonomy=printtaxonomy, findancestor=findancestor,
             filterbytaxa=filterbytaxa)


def main(argv: List[str]) -> int:
    if not argv or argv[0] not in TOOLS:
        print("taxonomy tools: " + ", ".join(TOOLS), file=sys.stderr)
        return 1
    return TOOLS[argv[0]](argv[1:])
