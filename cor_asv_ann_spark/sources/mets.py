"""OCR-D workspace METS support (stdlib ElementTree, no ocrd lib).

The reference processors never take bare directories — they are run on
an OCR-D workspace: a directory whose ``mets.xml`` catalogues page
files per fileGrp (``mets:fileGrp[@USE]`` → ``mets:file`` →
``mets:FLocat/@xlink:href``) with the physical page order in the
``TYPE="physical"`` structMap (``mets:div[@TYPE="page"]`` +
``mets:fptr``); outputs are new files in a new fileGrp, registered
back into the METS (ocrd Workspace.add_file semantics — see the
reference's tests/conftest.py:34-48 resolving inputs via
workspace.mets.find_files, and wrapper/evaluate.py:192).

This module gives the Spark CLIs the same front door:

* :func:`filegrp_paths` — resolve one fileGrp to its page-file paths
  (physical page order, PAGE-XML mimetype only), feed straight into
  ``read_pagexml_full``.
* :func:`page_ids_of` — file path → @ID of the physical page div, so
  outputs can carry workspace page identity.
* :func:`add_filegrp` — register a directory of produced PAGE-XML
  files as a new fileGrp (file ids ``<GRP>_<page>``, one fptr per
  physical page div) and rewrite the METS.

All of this is driver-side on purpose: one METS is a few hundred KB
describing one book — the unit the reference CLI processes. Corpus
scale comes from the page files themselves (the Spark scan), not the
catalogue; a million-workspace crawl would list the mets.xml paths
and union the resolved file lists (still a metadata-sized driver
step, ~100 bytes/page).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

METS_NS = "http://www.loc.gov/METS/"
XLINK_NS = "http://www.w3.org/1999/xlink"
MIMETYPE_PAGE = "application/vnd.prima.page+xml"

_M = f"{{{METS_NS}}}"
_XL = f"{{{XLINK_NS}}}"


def _href(flocat) -> str | None:
    return flocat.get(f"{_XL}href") or flocat.get("href")


def parse_mets(mets_path: str) -> dict:
    """mets.xml → ``{"file_grps": {USE: [(file_id, mimetype, path)]},
    "page_of": {file_id: page_div_id}, "page_order": [page_div_id]}``.
    Paths are resolved relative to the METS directory (the OCR-D
    convention: hrefs like ``OCR-D-GT/page1.xml``)."""
    base = os.path.dirname(os.path.abspath(mets_path))
    root = ET.parse(mets_path).getroot()
    file_grps: dict[str, list[tuple[str, str, str]]] = {}
    for sec in root.iter(f"{_M}fileSec"):
        for grp in sec.findall(f"{_M}fileGrp"):
            use = grp.get("USE") or ""
            entries = []
            for f in grp.findall(f"{_M}file"):
                fid = f.get("ID") or ""
                mt = f.get("MIMETYPE") or ""
                flocat = f.find(f"{_M}FLocat")
                href = _href(flocat) if flocat is not None else None
                if not href:
                    continue
                path = href if os.path.isabs(href) else os.path.join(base, href)
                entries.append((fid, mt, path))
            file_grps[use] = entries
    page_of: dict[str, str] = {}
    page_order: list[str] = []
    for smap in root.iter(f"{_M}structMap"):
        if smap.get("TYPE") != "physical":
            continue
        for div in smap.iter(f"{_M}div"):
            if div.get("TYPE") != "page":
                continue
            pid = div.get("ID") or ""
            page_order.append(pid)
            for fptr in div.findall(f"{_M}fptr"):
                fileid = fptr.get("FILEID")
                if fileid:
                    page_of[fileid] = pid
    return {"file_grps": file_grps, "page_of": page_of,
            "page_order": page_order}


def filegrp_paths(
    mets_path: str, file_grp: str, mimetype: str = MIMETYPE_PAGE
) -> list[str]:
    """One fileGrp → page-file paths in physical page order (files
    without a structMap entry keep fileSec order at the end). Raises
    KeyError on an unknown group — a typoed -I must not silently read
    zero pages."""
    meta = parse_mets(mets_path)
    if file_grp not in meta["file_grps"]:
        raise KeyError(
            f"fileGrp {file_grp!r} not in METS "
            f"(has: {sorted(meta['file_grps'])})"
        )
    pos = {pid: i for i, pid in enumerate(meta["page_order"])}
    entries = [
        (fid, path)
        for fid, mt, path in meta["file_grps"][file_grp]
        if not mimetype or mt == mimetype
    ]
    entries.sort(
        key=lambda e: pos.get(meta["page_of"].get(e[0], ""), len(pos))
    )
    return [path for _, path in entries]


def page_ids_of(
    mets_path: str, file_grp: str, mimetype: str = MIMETYPE_PAGE
) -> dict[str, str]:
    """doc_id (file basename sans .xml/.page — the reader's key) →
    physical page @ID for one fileGrp."""
    meta = parse_mets(mets_path)
    out = {}
    for fid, mt, path in meta["file_grps"].get(file_grp, []):
        if mimetype and mt != mimetype:
            continue
        doc_id = os.path.basename(path)
        for ext in (".xml", ".page"):
            if doc_id.endswith(ext):
                doc_id = doc_id[: -len(ext)]
        out[doc_id] = meta["page_of"].get(fid, "")
    return out


def add_filegrp(
    mets_path: str,
    file_grp: str,
    files: list[str],
    page_ids: dict[str, str] | None = None,
    mimetype: str = MIMETYPE_PAGE,
) -> int:
    """Register produced files as a new (or replaced) fileGrp and add
    one structMap fptr per file whose page div is known. ``files`` are
    paths under the workspace; hrefs are stored relative to the METS
    directory. Returns the number of files registered."""
    base = os.path.dirname(os.path.abspath(mets_path))
    ET.register_namespace("mets", METS_NS)
    ET.register_namespace("xlink", XLINK_NS)
    tree = ET.parse(mets_path)
    root = tree.getroot()
    filesec = root.find(f"{_M}fileSec")
    if filesec is None:
        filesec = ET.SubElement(root, f"{_M}fileSec")
    # replace an existing group of the same USE (rerun semantics) and
    # remember its ACTUAL file ids — prefix matching would both leave
    # dangling fptrs for foreign id schemes and delete another group's
    # fptrs that merely share the prefix
    removed_ids: set[str] = set()
    for grp in filesec.findall(f"{_M}fileGrp"):
        if grp.get("USE") == file_grp:
            removed_ids.update(
                f.get("ID") or "" for f in grp.findall(f"{_M}file")
            )
            filesec.remove(grp)
    removed_ids.discard("")
    grp = ET.SubElement(filesec, f"{_M}fileGrp", {"USE": file_grp})
    phys = None
    for smap in root.iter(f"{_M}structMap"):
        if smap.get("TYPE") == "physical":
            phys = smap
            if removed_ids:
                for div in smap.iter(f"{_M}div"):
                    for fptr in list(div.findall(f"{_M}fptr")):
                        if (fptr.get("FILEID") or "") in removed_ids:
                            div.remove(fptr)
    divs_by_id = {}
    if phys is not None:
        divs_by_id = {
            div.get("ID"): div
            for div in phys.iter(f"{_M}div")
            if div.get("TYPE") == "page"
        }
    n = 0
    for path in files:
        doc_id = os.path.basename(path)
        for ext in (".xml", ".page", ".json"):
            if doc_id.endswith(ext):
                doc_id = doc_id[: -len(ext)]
        fid = f"{file_grp}_{doc_id}"
        fel = ET.SubElement(
            grp, f"{_M}file", {"ID": fid, "MIMETYPE": mimetype}
        )
        ET.SubElement(
            fel,
            f"{_M}FLocat",
            {
                "LOCTYPE": "OTHER",
                "OTHERLOCTYPE": "FILE",
                f"{_XL}href": os.path.relpath(path, base),
            },
        )
        pid = (page_ids or {}).get(doc_id)
        if pid and pid in divs_by_id:
            ET.SubElement(divs_by_id[pid], f"{_M}fptr", {"FILEID": fid})
        n += 1
    tree.write(mets_path, encoding="utf-8", xml_declaration=True)
    return n


def resolve_workspace(
    mets_path: str,
    input_file_grp: str,
    output_file_grp: str | None = None,
    remap_pages: bool = False,
):
    """CLI -I/-O resolution (the ocrd_cli_options contract): comma-split
    ``input_file_grp``, resolve each group to its page files, and — when
    an output group is named — prepare its directory next to the METS
    plus a ``register(files)`` callback that books the produced files
    into the METS.

    ``remap_pages=True`` is for the MULTI-group processors (align /
    join / evaluate): a real workspace names each group's files after
    its own FILEIDs (``OCR-D-OCR1_0001.xml`` vs ``OCR-D-OCR2_0001.xml``),
    so file basenames NEVER collide across groups — cross-group
    matching must go through the structMap physical page. Each group
    then gets a ``page_maps`` entry (basename → physical page @ID) to
    rewrite ``doc_id`` with (see :func:`remap_doc_ids`), output files
    are named by page id, and ``register`` books them with an identity
    page map.

    Returns ``(paths_per_grp, out_dir, register, page_maps)``;
    ``out_dir``/``register`` are None without an output group."""
    grps = [g for g in input_file_grp.split(",") if g]
    paths_per_grp = [filegrp_paths(mets_path, g) for g in grps]
    for g, paths in zip(grps, paths_per_grp):
        if not paths:
            raise ValueError(f"fileGrp {g!r} has no PAGE-XML files")
    page_maps = [page_ids_of(mets_path, g) for g in grps]
    if output_file_grp is None:
        return paths_per_grp, None, None, page_maps
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(mets_path)), output_file_grp
    )
    os.makedirs(out_dir, exist_ok=True)
    if remap_pages:
        pids = {pid: pid for pid in page_maps[0].values() if pid}
    else:
        pids = page_maps[0]

    def register(files: list[str]) -> int:
        return add_filegrp(
            mets_path, output_file_grp, sorted(files), page_ids=pids
        )

    return paths_per_grp, out_dir, register, page_maps


def remap_doc_ids(df, page_map: dict[str, str]):
    """Rewrite a frame's ``doc_id`` (file basename) to the physical
    page @ID via a broadcast map literal (workspace-bounded: one entry
    per page of one book). Basenames without a structMap entry pass
    through unchanged."""
    from pyspark.sql import functions as F

    entries = {k: v for k, v in (page_map or {}).items() if v}
    if not entries:
        return df
    m = F.create_map(
        *[F.lit(x) for kv in entries.items() for x in kv]
    )
    return df.withColumn(
        "doc_id", F.coalesce(m.getItem(F.col("doc_id")), F.col("doc_id"))
    )


def synth_mets(
    workspace_dir: str, file_grps: dict
) -> str:
    """Test helper: write a minimal valid mets.xml for page files
    already present under ``workspace_dir`` — ``file_grps`` maps USE →
    relative file paths (page divs keyed by file basename), or USE →
    ``(rel_path, page_id)`` tuples for the realistic case where each
    group names its files differently and only the structMap ties them
    to the same physical page. Returns the mets.xml path."""
    root = ET.Element(f"{_M}mets")
    filesec = ET.SubElement(root, f"{_M}fileSec")
    pages: dict[str, list[str]] = {}
    for use, rels in file_grps.items():
        grp = ET.SubElement(filesec, f"{_M}fileGrp", {"USE": use})
        for rel in rels:
            pid = None
            if isinstance(rel, tuple):
                rel, pid = rel
            doc = os.path.basename(rel).rsplit(".", 1)[0]
            fid = f"{use}_{doc}"
            fel = ET.SubElement(
                grp, f"{_M}file", {"ID": fid, "MIMETYPE": MIMETYPE_PAGE}
            )
            ET.SubElement(
                fel, f"{_M}FLocat",
                {"LOCTYPE": "OTHER", "OTHERLOCTYPE": "FILE",
                 f"{_XL}href": rel},
            )
            pages.setdefault(pid or f"phys_{doc}", []).append(fid)
    smap = ET.SubElement(root, f"{_M}structMap", {"TYPE": "physical"})
    top = ET.SubElement(smap, f"{_M}div", {"TYPE": "physSequence"})
    for i, (pid, fids) in enumerate(sorted(pages.items())):
        div = ET.SubElement(
            top, f"{_M}div",
            {"TYPE": "page", "ID": pid, "ORDER": str(i + 1)},
        )
        for fid in fids:
            ET.SubElement(div, f"{_M}fptr", {"FILEID": fid})
    ET.register_namespace("mets", METS_NS)
    ET.register_namespace("xlink", XLINK_NS)
    path = os.path.join(workspace_dir, "mets.xml")
    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)
    return path
