"""GO-term propagation (true-path rule) with a built-in OBO parser.

Behaviour parity with reference ``mDeepFRI/go_propagation.py``: ancestors via
``is_a``/``part_of`` edges only (:68-94), root terms excluded (:29),
propagated ancestors inherit the maximum descendant score (:97-241), EC
numbers pass through untouched (:186-190), output is ``results.tsv`` plus a
``propagated`` column sorted by (protein, original-first, score desc, term)
(:243-260). obonet/networkx are replaced by a small OBO stanza parser and an
iterative DFS with memoisation.
"""

from __future__ import annotations

import csv
import logging
import urllib.request
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Set, Tuple

logger = logging.getLogger(__name__)

GO_OBO_URL = "http://purl.obolibrary.org/obo/go/go-basic.obo"

# Root GO term IDs: BP, MF, CC (reference go_propagation.py:29)
ROOT_IDS = frozenset({"GO:0008150", "GO:0003674", "GO:0005575"})


def download_obo(obo_path: Path) -> Path:
    """Fetch go-basic.obo unless already present (reference :32-55)."""
    obo_path = Path(obo_path)
    if obo_path.exists():
        logger.info("OBO file already exists: %s", obo_path)
        return obo_path
    obo_path.parent.mkdir(parents=True, exist_ok=True)
    logger.info("Downloading go-basic.obo from %s", GO_OBO_URL)
    req = urllib.request.Request(GO_OBO_URL,
                                 headers={"User-Agent": "mdeepfri-tpu"})
    with urllib.request.urlopen(req) as response, open(obo_path, "wb") as out:
        out.write(response.read())
    return obo_path


class GoDag:
    """Parsed GO DAG: child → parents edges typed by relation."""

    def __init__(self):
        self.names: Dict[str, str] = {}
        self.obsolete: Set[str] = set()
        # term -> list of (relation, parent)
        self.parents: Dict[str, List[Tuple[str, str]]] = defaultdict(list)
        self.alt_ids: Dict[str, str] = {}

    @classmethod
    def from_obo(cls, obo_path) -> "GoDag":
        dag = cls()
        term_id: Optional[str] = None
        in_term = False
        with open(obo_path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line.startswith("["):
                    in_term = line == "[Term]"
                    term_id = None
                    continue
                if not in_term or not line:
                    continue
                if line.startswith("id:"):
                    term_id = line[3:].strip()
                elif term_id is None:
                    continue
                elif line.startswith("name:"):
                    dag.names[term_id] = line[5:].strip()
                elif line.startswith("alt_id:"):
                    dag.alt_ids[line[7:].strip()] = term_id
                elif line.startswith("is_obsolete: true"):
                    dag.obsolete.add(term_id)
                elif line.startswith("is_a:"):
                    parent = line[5:].strip().split("!")[0].strip()
                    dag.parents[term_id].append(("is_a", parent))
                elif line.startswith("relationship:"):
                    parts = line[13:].strip().split()
                    if len(parts) >= 2:
                        dag.parents[term_id].append((parts[0], parts[1]))
        return dag

    def __contains__(self, term: str) -> bool:
        return term in self.names or term in self.parents

    def name(self, term: str) -> str:
        return self.names.get(term, "")

    def ancestors(self, term: str,
                  relations: Tuple[str, ...] = ("is_a", "part_of"),
                  exclude_roots: bool = True,
                  _cache: Optional[dict] = None) -> frozenset:
        """All ancestors reachable via the given relations (reference
        :68-94 + the obsolete/root handling of :134-142)."""
        if term in self.obsolete:
            return frozenset()
        rel = set(relations)
        visited: Set[str] = set()
        stack = [term]
        while stack:
            node = stack.pop()
            if node in visited:
                continue
            visited.add(node)
            for rtype, parent in self.parents.get(node, ()):
                if rtype in rel and parent not in visited:
                    stack.append(parent)
        visited.discard(term)
        if exclude_roots:
            visited -= ROOT_IDS
        return frozenset(visited)


def propagate_results(results_path,
                      output_path,
                      obo_path,
                      relations: Tuple[str, ...] = ("is_a", "part_of"),
                      exclude_roots: bool = True) -> Path:
    """Expand ``results.tsv`` with propagated ancestor terms (reference
    ``go_propagation.py:97-269``)."""
    dag = GoDag.from_obo(obo_path)
    anc_cache: Dict[str, frozenset] = {}

    def ancestors(term: str) -> frozenset:
        if term not in anc_cache:
            anc_cache[term] = dag.ancestors(term, relations, exclude_roots)
        return anc_cache[term]

    with open(results_path, "r", encoding="utf-8") as f:
        reader = csv.reader(f, delimiter="\t")
        header = next(reader)
        rows = [row for row in reader]

    # (protein, mode) -> {term: (score, row)}
    groups: Dict[Tuple[str, str], Dict[str, Tuple[float, list]]] = \
        defaultdict(dict)
    for row in rows:
        protein, mode, term = row[0], row[2], row[3]
        try:
            score = float(row[4])
        except (ValueError, IndexError):
            score = 0.0
        key = (protein, mode)
        if term not in groups[key] or score > groups[key][term][0]:
            groups[key][term] = (score, row)

    output_rows = []
    for (protein, mode), term_data in groups.items():
        term_scores: Dict[str, float] = {}
        term_propagated: Dict[str, bool] = {}
        originals: Dict[str, list] = {}
        for term, (score, row) in term_data.items():
            term_scores[term] = max(score, term_scores.get(term, score))
            term_propagated[term] = False
            originals[term] = row
            if not term.startswith("GO:"):
                continue  # EC numbers pass through
            for anc in ancestors(term):
                if anc not in term_scores or score > term_scores[anc]:
                    term_scores[anc] = score
                if anc not in term_propagated:
                    term_propagated[anc] = True

        for term, score in term_scores.items():
            is_prop = term_propagated.get(term, True)
            if term in originals:
                row = list(originals[term])
            else:
                template = next(iter(term_data.values()))[1]

                def tcol(i):
                    return template[i] if len(template) > i else ""

                row = [protein, tcol(1), tcol(2), term, f"{score:.4f}",
                       dag.name(term), tcol(6), tcol(7), tcol(8), tcol(9),
                       tcol(10), tcol(11)]
            try:
                row[4] = f"{float(row[4]):.4f}"
            except (ValueError, IndexError):
                pass
            row.append("True" if is_prop else "False")
            output_rows.append(row)

    def sort_key(row):
        try:
            score = -float(row[4])
        except (ValueError, IndexError):
            score = 0
        return (row[0], row[-1] == "True", score, row[3])

    output_rows.sort(key=sort_key)

    output_path = Path(output_path)
    with open(output_path, "w", encoding="utf-8", newline="") as f:
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(header + ["propagated"])
        writer.writerows(output_rows)

    n_orig = sum(1 for r in output_rows if r[-1] == "False")
    logger.info(
        "GO propagation complete: %d original + %d propagated = %d total "
        "rows", n_orig, len(output_rows) - n_orig, len(output_rows))
    return output_path
