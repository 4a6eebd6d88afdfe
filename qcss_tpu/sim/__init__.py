"""In-process quantum simulation.

`qcss_tpu.sim.tableau` — the workhorse: a batched, bit-matrix CHP
(Aaronson-Gottesman) stabilizer-tableau simulator in JAX, replacing the
reference's external Forest QVM process (reference: test/test_ftqc.py:153-156
connects to a separately launched Lisp simulator over rpcq/zmq). Polynomial
in qubit count where the QVM is exponential — the reference skips its own
2-logical-qubit test as "too slow" (reference: test/test_ftqc.py:115).

`qcss_tpu.sim.noise` — explicit seeded Pauli noise channels, replacing the
QVM decoherence noise model (reference: test/test_fidelity.py:76-82).

`qcss_tpu.sim.statevec` — a tiny dense statevector simulator (numpy, n <= ~10)
used only in tests as ground truth for the tableau rules.
"""

from qcss_tpu.sim.tableau import Tableau, run_circuit, measure_z, reset_z
from qcss_tpu.sim import noise

__all__ = ["Tableau", "run_circuit", "measure_z", "reset_z", "noise"]
