import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

# replicate bench.py setup
from tdnnf_nas_tpu.data import (SyntheticCorpusConfig, make_synthetic_corpus,
                                EgsConfig, make_egs, batch_iterator)
from tdnnf_nas_tpu.graphs import (estimate_phone_lm, build_denominator_graph,
                                  den_init_lookup)
from tdnnf_nas_tpu.graphs.topology import BiphoneTree
from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
from tdnnf_nas_tpu.train import (TrainerConfig, OptimizerConfig,
                                 ChainObjectiveConfig, init_train_state,
                                 make_train_step)

num_phones = 46
corpus_cfg = SyntheticCorpusConfig(num_utts=64, num_phones=num_phones,
                                   feat_dim=40, min_phones=10, max_phones=30,
                                   mean_dur=4.0, seed=0)
utts, phone_seqs, _, topo = make_synthetic_corpus(corpus_cfg)
tree = BiphoneTree(num_phones, num_leaves=6034 - num_phones)
lm = estimate_phone_lm(phone_seqs, num_phones)
den = build_denominator_graph(lm, topo, tree)
model_cfg = TdnnfModelConfig(num_pdfs=tree.num_pdfs)
left, right = model_context(model_cfg)
chunks = make_egs(utts, lm, topo, tree,
                  EgsConfig(chunk_width=50, left_context=left,
                            right_context=right, max_phones_per_chunk=40),
                  den_init_fn=den_init_lookup(den, num_phones))
tr = TrainerConfig(objective=ChainObjectiveConfig(pallas_den=True),
                   optimizer=OptimizerConfig(num_steps=100000))
state = init_train_state(model_cfg, tr, jax.random.PRNGKey(0))
step = make_train_step(model_cfg, tr, DenGraphArrays.from_graph(den))
batch = next(batch_iterator(chunks, batch_size=64,
                            rng=np.random.RandomState(0), drop_last=False))
batch["ivectors"] = np.zeros((64, 100), np.float32)
batch = jax.tree.map(jnp.asarray, batch)
key = jax.random.PRNGKey(7)
for _ in range(3):
    state, m = step(state, batch, key)
jax.block_until_ready(m)
logdir = "/tmp/jaxtrace_step"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(5):
        state, m = step(state, batch, key)
    jax.block_until_ready(m)
print("done", glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
