"""Non-Markovian memory characterization.

Components (reference: mqt-yaqs characterization/memory/*):

- interventions: measure-prepare / Haar-unitary probe sampling + Choi features
- exact: dense rho-space sequence simulator, vmapped over the probe grid
- process_tensor: multi-time Choi process tensor (build / evaluate / QMI / CMI)
- mpo_process_tensor: leg-by-leg tensor-train process tensor (16*chi
  simulations per leg instead of 16^k; noisy legs supported)
- response: split-cut response matrix + spectrum diagnostics
- surrogate: flax Transformer surrogate over intervention sequences
"""
