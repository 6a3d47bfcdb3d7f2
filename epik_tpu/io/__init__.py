from .db import PhyloKmerDB, load, save
from .ipk_boost import read_ipk, write_ipk
from .fasta import batch_fasta, read_fasta
from .jplace import jplace_writer
