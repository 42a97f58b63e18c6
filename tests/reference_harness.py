"""Harness for golden-parity testing against the PyTorch reference.

Imports the reference implementation from /root/reference/Code (read-only) so
our JAX model can be checked activation-for-activation against it in eval
mode.  The reference is IMPORTED for oracle comparison only — nothing is
copied into the framework.
"""

import sys
import types

import numpy as np


def import_reference_modules():
    """Import the reference's Modules.py with unavailable deps stubbed."""
    if "pybloom_live" not in sys.modules:
        stub = types.ModuleType("pybloom_live")

        class BloomFilter:
            def __init__(self, capacity, error_rate=1e-3):
                self.capacity = capacity
                self._s = set()

            def add(self, item):
                self._s.add(item)

            def __contains__(self, item):
                return item in self._s

            def __len__(self):
                return len(self._s)

        stub.BloomFilter = BloomFilter
        sys.modules["pybloom_live"] = stub

    ref_path = "/root/reference/Code"
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import Modules  # noqa
    return Modules


def copy_params_to_torch(params, torch_model, num_chroms):
    """Write our JAX params into the torch Classifier (transposing layouts).

    Ours are (in, out); torch Linear/Conv1d are (out, in[, 1])."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x).T.copy())

    def v(x):
        return torch.from_numpy(np.asarray(x).copy())

    with torch.no_grad():
        ne = torch_model.node_embedding
        for c in range(num_chroms):
            ae = params["embed"]["ae"][c]
            ne.wstack[c].weight_list[0].copy_(t(ae["w1"]))
            ne.wstack[c].weight_list[1].copy_(t(ae["w2"]))
            rec = params["embed"]["recon"][c]
            ne.recon[c].w_stack[0].weight.copy_(t(rec["w"]))
            ne.recon[c].w_stack[0].bias.copy_(v(rec["b"]))

        torch_model.attribute_nn.weight.copy_(t(params["attr_nn"]["w"]))
        torch_model.attribute_nn.bias.copy_(v(params["attr_nn"]["b"]))
        nw = params["next_w"]["layers"][0]
        torch_model.next_w.w_stack[0].weight.copy_(t(nw["w"]))
        torch_model.next_w.w_stack[0].bias.copy_(v(nw["b"]))

        mha = params["encoder"]["mha"]
        enc = torch_model.encode1.mul_head_attn
        enc.layer_norm1.weight.copy_(v(mha["ln_q"]["g"]))
        enc.layer_norm1.bias.copy_(v(mha["ln_q"]["b"]))
        enc.layer_norm2.weight.copy_(v(mha["ln_k"]["g"]))
        enc.layer_norm2.bias.copy_(v(mha["ln_k"]["b"]))
        enc.layer_norm3.weight.copy_(v(mha["ln_v"]["g"]))
        enc.layer_norm3.bias.copy_(v(mha["ln_v"]["b"]))
        enc.w_qs.weight.copy_(t(mha["wq"]))
        enc.w_ks.weight.copy_(t(mha["wk"]))
        enc.w_vs.weight.copy_(t(mha["wv"]))
        enc.fc1.weight.copy_(t(mha["fc1"]["w"]))
        enc.fc1.bias.copy_(v(mha["fc1"]["b"]))

        pffp = params["encoder"]["pff_n1"]
        tp = torch_model.encode1.pff_n1
        for i, lp in enumerate(pffp["layers"]):
            tp.w_stack[i].weight.copy_(t(lp["w"]).unsqueeze(-1))
            tp.w_stack[i].bias.copy_(v(lp["b"]))
        tp.layer_norm.weight.copy_(v(pffp["ln"]["g"]))
        tp.layer_norm.bias.copy_(v(pffp["ln"]["b"]))

        torch_model.layer_norm1.weight.copy_(v(params["ln_dynamic"]["g"]))
        torch_model.layer_norm1.bias.copy_(v(params["ln_dynamic"]["b"]))
        torch_model.layer_norm2.weight.copy_(v(params["ln_static"]["g"]))
        torch_model.layer_norm2.bias.copy_(v(params["ln_static"]["b"]))

        pc = params["pff_classifier"]["layers"][0]
        torch_model.pff_classifier.w_stack[0].weight.copy_(
            t(pc["w"]).unsqueeze(-1))
        torch_model.pff_classifier.w_stack[0].bias.copy_(v(pc["b"]))


def build_torch_reference(genome, intra, inter, dim, n_head):
    """Instantiate the reference MultipleEmbedding + Classifier on CPU."""
    import torch

    Modules = import_reference_modules()

    num = [int(e - s) for s, e in genome.chrom_range]
    num_list = torch.as_tensor(np.cumsum(num))

    embeddings_initial = []
    for s, e in genome.chrom_range:
        block = intra[s - 1:e - 1, s - 1:e - 1].astype(np.float32)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.corrcoef(block).astype("float32")
        corr[np.isnan(corr)] = 0.0
        embeddings_initial.append(corr)

    # attributes exactly as ref get_attributes (Code/main.py:497-512)
    attribute_all = []
    for i in range(len(num)):
        chrom = np.zeros((num[i], len(num)))
        chrom[:, i] = 1
        coor = np.arange(num[i]).reshape(-1, 1).astype("float32") / num[0]
        attribute_all.append(np.concatenate([chrom, coor], axis=-1))
    attribute_all = np.concatenate(attribute_all, axis=0)
    attribute_dict = np.concatenate(
        [np.zeros((1, attribute_all.shape[-1])), attribute_all],
        axis=0).astype("float32")

    node_embedding = Modules.MultipleEmbedding(
        embeddings_initial, dim, False, num_list,
        genome.chrom_range.tolist(), inter.astype("float32").copy())
    classifier = Modules.Classifier(
        n_head=n_head, d_model=dim, d_k=dim, d_v=dim,
        node_embedding=node_embedding, diag_mask=True, bottle_neck=dim,
        attribute_dict=attribute_dict)
    classifier.eval()
    return classifier
