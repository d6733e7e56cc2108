"""One-off extractor: serializes the public AlphaFold2 stereochemistry constants
(residue types, atom layouts, literature rigid-group atom positions, chi
definitions) into the compact text table shipped at
``mdgen_tpu/geometry/constants/stereo_tables.txt``.

These are literature-derived physical constants (bond geometry from
Engh & Huber etc., as tabulated by AlphaFold2 / OpenFold, Apache-2.0). Only the
raw data is serialized here; every derived table (frames, masks, index maps) is
computed from scratch in ``mdgen_tpu/geometry/constants/__init__.py``.

Usage: python tools/extract_constants.py /path/to/reference/mdgen/residue_constants.py
"""
import importlib.util
import sys


def main(src_path: str, out_path: str) -> None:
    spec = importlib.util.spec_from_file_location("ref_rc", src_path)
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    lines = []
    lines.append("# AlphaFold2 stereochemistry constants (public literature data).")
    lines.append("# Sections: restypes, atom37, atom14, rigid_groups, chi_atoms")

    lines.append("[restypes]")
    for letter in rc.restypes:
        lines.append(f"{letter} {rc.restype_1to3[letter]}")

    lines.append("[atom37]")
    lines.append(" ".join(rc.atom_types))

    lines.append("[atom14]")
    for letter in rc.restypes:
        name3 = rc.restype_1to3[letter]
        slots = [a if a else "-" for a in rc.restype_name_to_atom14_names[name3]]
        lines.append(f"{name3} " + " ".join(slots))

    lines.append("[rigid_groups]")
    for letter in rc.restypes:
        name3 = rc.restype_1to3[letter]
        for atom, group, (x, y, z) in rc.rigid_group_atom_positions[name3]:
            lines.append(f"{name3} {atom} {group} {x:.3f} {y:.3f} {z:.3f}")

    lines.append("[chi_atoms]")
    for letter in rc.restypes:
        name3 = rc.restype_1to3[letter]
        for k, quad in enumerate(rc.chi_angles_atoms[name3]):
            lines.append(f"{name3} {k} " + " ".join(quad))

    lines.append("[chi_pi_periodic]")
    for letter in rc.restypes:
        name3 = rc.restype_1to3[letter]
        flags = rc.chi_pi_periodic[rc.restype_order[letter]]
        lines.append(f"{name3} " + " ".join(str(int(f)) for f in flags))

    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(lines)} lines)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/mdgen/residue_constants.py"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "mdgen_tpu/geometry/constants/stereo_tables.txt"
    )
    main(src, out)
