"""mxmoe_tpu — a TPU-native mixed-precision quantized MoE inference engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of MxMoE
(arXiv:2505.05799): the full accuracy/performance co-design loop —

  1. trace    : per-expert gate activation statistics on calibration data
  2. calibrate: per-linear-block quantization loss for each candidate scheme
                (RTN / GPTQ, optionally with Hadamard rotation)
  3. profile  : on-device autotuned kernel cost model (performance table)
  4. solve    : ILP assigns a quant scheme + kernel tile config per expert
                linear under an average-bitwidth budget
  5. execute  : scheme-bucketed Pallas grouped matmuls with dequant fused
                into MXU compute
  6. evaluate : perplexity / task accuracy of the quantized model, and a
                check/bench kernel harness

plus (beyond the single-GPU reference) multi-chip expert-parallel execution
over a `jax.sharding.Mesh` with token all-to-all dispatch.

The reference's layer map is documented in /root/repo/SURVEY.md; this package
re-designs each layer TPU-first rather than porting CUDA.
"""

__version__ = "0.1.0"
