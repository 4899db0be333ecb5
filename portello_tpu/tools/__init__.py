"""Companion CLI tools (samtools-lite utilities the framework ships so users
don't need external tooling for the common post-liftover steps):

- ``python -m portello_tpu.tools.view``   BAM -> SAM text dump
- ``python -m portello_tpu.tools.index``  build a .bai index
- ``python -m portello_tpu.tools.merge``  concatenate unsorted BAM shards
  (the multi-host output merge path, SURVEY.md section 5 "Distributed
  communication backend")
- ``python -m portello_tpu.tools.sort``   coordinate sort (the `samtools
  sort` step the reference workflow delegates externally)
"""
