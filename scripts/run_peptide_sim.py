"""Ground-truth MD generation with OpenMM (host-side, optional dependency).

Port of reference `scripts/run_peptide_sim.py`: builds a peptide, solvates
(amber14 explicit TIP3P-FB + PME + barostat, or implicit gbn2), runs
LangevinMiddle at 350 K / 2 fs with NVT equilibration then production,
saving heavy atoms every ``save_ps``; converts the result to a superposed
trajectory + topology PDB.

OpenMM / pdbfixer / pymol / mdtraj are NOT part of the TPU image — this
script is for MD-generation hosts. It fails fast with a clear message if the
toolchain is missing.
"""
import argparse
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--indir", type=str, default="4AA")
parser.add_argument("--outdir", type=str, default="4AA_sims")
parser.add_argument("--worker_id", type=int, default=0)
parser.add_argument("--num_workers", type=int, default=1)
parser.add_argument("--pdb_id", nargs="*", default=[])
parser.add_argument("--joblist", type=str, default="splits/1k_4AA.csv")
parser.add_argument("--implicit", action="store_true")
parser.add_argument("--sim_ns", type=float, default=100)
parser.add_argument("--print_freq", type=int, default=1000)
parser.add_argument("--save_ps", type=float, default=0.1)
parser.add_argument("--friction_coeff", type=float, default=0.3)
parser.add_argument("--md_device", type=str, default="CPU")
parser.add_argument("--equil_steps", type=int, default=10000)
parser.add_argument("--temp_K", type=float, default=350.0)
args = parser.parse_args()

try:
    import mdtraj
    import openmm
    from openmm import LangevinMiddleIntegrator, MonteCarloBarostat, Platform, unit
    from openmm.app import (
        PME,
        ForceField,
        HBonds,
        Modeller,
        PDBFile,
        Simulation,
        StateDataReporter,
    )
except ImportError as e:  # pragma: no cover - env without MD toolchain
    sys.exit(
        f"run_peptide_sim requires the OpenMM/mdtraj toolchain ({e}). "
        "Run this on an MD host; the TPU image intentionally omits it."
    )

import numpy as np
import pandas as pd

dt = 2 * unit.femtosecond
total_steps = int((args.sim_ns * unit.nanosecond) / dt)
save_interval = int((args.save_ps * unit.picosecond) / dt)
print(f"{total_steps} steps, saving every {save_interval} -> "
      f"{total_steps // save_interval} frames")


def make(aa: str):
    """Build an extended peptide PDB (pymol fab) and add heavy atoms."""
    from pdbfixer import PDBFixer
    from pymol import cmd

    cmd.reinitialize()
    cmd.fab(aa, hydro=0)
    os.makedirs(args.indir, exist_ok=True)
    path = f"{args.indir}/{aa}.pdb"
    cmd.save(path)
    fixer = PDBFixer(filename=path)
    fixer.missingResidues = {}
    fixer.findMissingAtoms()
    fixer.addMissingAtoms()
    with open(path, "w") as fh:
        PDBFile.writeFile(fixer.topology, fixer.positions, fh, True)


def do(name: str):
    os.makedirs(f"{args.outdir}/{name}", exist_ok=True)
    aa = name.split("_")[0]
    if not os.path.exists(f"{args.indir}/{aa}.pdb"):
        make(aa)
    pdb = PDBFile(f"{args.indir}/{aa}.pdb")

    if args.implicit:
        forcefield = ForceField("amber14-all.xml", "implicit/gbn2.xml")
    else:
        forcefield = ForceField("amber14-all.xml", "amber14/tip3pfb.xml")
    modeller = Modeller(pdb.topology, pdb.positions)
    modeller.addHydrogens(forcefield, pH=7)

    if args.implicit:
        system = forcefield.createSystem(modeller.topology, constraints=HBonds)
    else:
        modeller.addSolvent(forcefield, padding=1.0 * unit.nanometer)
        system = forcefield.createSystem(
            modeller.topology,
            nonbondedMethod=PME,
            nonbondedCutoff=1.0 * unit.nanometer,
            constraints=HBonds,
        )

    integrator = LangevinMiddleIntegrator(
        args.temp_K * unit.kelvin, args.friction_coeff / unit.picosecond, dt
    )
    simulation = Simulation(
        modeller.topology, system, integrator,
        platform=Platform.getPlatformByName(args.md_device),
    )
    simulation.context.setPositions(modeller.positions)

    top = mdtraj.Topology.from_openmm(modeller.topology)
    mask = top.select("protein and not type H")
    reporter = mdtraj.reporters.HDF5Reporter(
        f"{args.outdir}/{name}/{name}.h5", reportInterval=save_interval,
        atomSubset=mask,
    )

    simulation.minimizeEnergy()
    simulation.reporters.append(
        StateDataReporter(
            sys.stdout, reportInterval=args.print_freq, step=True,
            potentialEnergy=True, temperature=True, speed=True,
            remainingTime=True, totalSteps=total_steps + args.equil_steps,
        )
    )
    # NVT equilibration
    simulation.step(args.equil_steps)
    if not args.implicit:
        system.addForce(MonteCarloBarostat(1 * unit.bar, args.temp_K * unit.kelvin))
        simulation.context.reinitialize(preserveState=True)
    # production
    simulation.reporters.append(reporter)
    simulation.step(total_steps)
    reporter.close()

    traj = mdtraj.load(f"{args.outdir}/{name}/{name}.h5")
    traj.superpose(traj)
    traj.save(f"{args.outdir}/{name}/{name}.xtc")
    traj[0].save(f"{args.outdir}/{name}/{name}.pdb")


def main():
    df = pd.read_csv(args.joblist, index_col="name")
    names = np.array(df.index)
    names = np.array_split(names, args.num_workers)[args.worker_id]
    for name in names:
        if args.pdb_id and name not in args.pdb_id:
            continue
        if os.path.exists(f"{args.outdir}/{name}/{name}.xtc"):
            continue
        do(name)


if __name__ == "__main__":
    main()
