"""On-device (XLA/Pallas) compute kernels: metrics, sampling, graph, attention."""
