"""nanocall_tpu: a TPU-native nanopore HMM basecalling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CPU basecaller nanocall (mateidavid/nanocall): fast5 event ingestion, 6-mer
pore models, a 4096-state stay/step/skip HMM, per-read EM training of
pore-model scaling and transition parameters, strand/hairpin detection, and
batched Viterbi decoding to FASTA, data-parallel over a TPU device mesh.
"""

def __getattr__(name):
    # lazy git-describe version stamping (src/get-dir-version parity)
    if name == "__version__":
        from .version import get_version

        return get_version()
    raise AttributeError(name)
