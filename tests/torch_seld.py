"""Torch mirror of the reference SELD_Model, used ONLY as a parity oracle.

Re-states the architecture spec of reference model.py:12-480 (MHA, gated
pre-activation ResBlock, TC block, ConvTC block, SELD model) so seld_tpu's
flax model can be checked to <=1e-5 on identical imported weights, per
SURVEY.md §4's weight-import parity mandate. Evaluation-mode semantics only
(dropout identity; BatchNorm running statistics).

State-dict keys intentionally match the reference's naming scheme
(``seld_block.cnn.{i}.0.*``, ``seld_block.tcn.ResBlocks.{j}.conv1_filter.*``,
``sed.{i}.*`` ...) so ``seld_tpu.utils.torch_import`` — the real
checkpoint-migration path for reference users — is exercised by the tests.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_oracle import dq_conv_weight, dq_linear_weight, q_conv_weight, q_linear_weight


class QConvT(nn.Module):
    def __init__(self, cin, cout, k, padding=0, dilation=1, bias=True, ndim=1):
        super().__init__()
        kshape = (k,) * ndim
        self.r_weight = nn.Parameter(torch.randn(cout // 4, cin // 4, *kshape))
        self.i_weight = nn.Parameter(torch.randn(cout // 4, cin // 4, *kshape))
        self.j_weight = nn.Parameter(torch.randn(cout // 4, cin // 4, *kshape))
        self.k_weight = nn.Parameter(torch.randn(cout // 4, cin // 4, *kshape))
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.padding, self.dilation, self.ndim = padding, dilation, ndim

    def forward(self, x):
        w = q_conv_weight(self.r_weight, self.i_weight, self.j_weight, self.k_weight)
        fn = F.conv1d if self.ndim == 1 else F.conv2d
        return fn(x, w, self.bias, 1, self.padding, self.dilation)


class DQConvT(nn.Module):
    def __init__(self, cin, cout, k, padding=0, dilation=1, bias=True, ndim=1):
        super().__init__()
        kshape = (k,) * ndim
        names = ["r_weight", "i_weight", "j_weight", "k_weight",
                 "r_weight_2", "i_weight_2", "j_weight_2", "k_weight_2"]
        for name in names:
            setattr(self, name, nn.Parameter(torch.randn(cout // 8, cin // 8, *kshape)))
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.padding, self.dilation, self.ndim = padding, dilation, ndim

    def forward(self, x):
        w = dq_conv_weight(
            (self.r_weight, self.i_weight, self.j_weight, self.k_weight),
            (self.r_weight_2, self.i_weight_2, self.j_weight_2, self.k_weight_2),
        )
        fn = F.conv1d if self.ndim == 1 else F.conv2d
        return fn(x, w, self.bias, 1, self.padding, self.dilation)


class QLinearT(nn.Module):
    def __init__(self, cin, cout, bias=True):
        super().__init__()
        for name in ["r_weight", "i_weight", "j_weight", "k_weight"]:
            setattr(self, name, nn.Parameter(torch.randn(cin // 4, cout // 4)))
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None

    def forward(self, x):
        out = x @ q_linear_weight(self.r_weight, self.i_weight, self.j_weight, self.k_weight)
        return out if self.bias is None else out + self.bias


class DQLinearT(nn.Module):
    def __init__(self, cin, cout, bias=True):
        super().__init__()
        names = ["r_weight", "i_weight", "j_weight", "k_weight",
                 "r_weight_2", "i_weight_2", "j_weight_2", "k_weight_2"]
        for name in names:
            setattr(self, name, nn.Parameter(torch.randn(cin // 8, cout // 8)))
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None

    def forward(self, x):
        out = x @ dq_linear_weight(
            (self.r_weight, self.i_weight, self.j_weight, self.k_weight),
            (self.r_weight_2, self.i_weight_2, self.j_weight_2, self.k_weight_2),
        )
        return out if self.bias is None else out + self.bias


def conv_for(domain, cin, cout, k, padding=0, dilation=1, bias=True, ndim=1):
    if domain == "Q":
        return QConvT(cin, cout, k, padding, dilation, bias, ndim)
    if domain == "DQ":
        return DQConvT(cin, cout, k, padding, dilation, bias, ndim)
    fn = nn.Conv1d if ndim == 1 else nn.Conv2d
    return fn(cin, cout, k, 1, padding, dilation, bias=bias)


def linear_for(domain, cin, cout, bias=True):
    if domain == "Q":
        return QLinearT(cin, cout, bias)
    if domain == "DQ":
        return DQLinearT(cin, cout, bias)
    return nn.Linear(cin, cout, bias=bias)


class MHAT(nn.Module):
    """Reference MultiHeadAttention semantics (model.py:12-51)."""

    def __init__(self, embed, heads=8):
        super().__init__()
        self.h = heads
        self.d = embed // heads
        self.values = nn.Conv1d(embed, embed, 1, bias=False)
        self.keys = nn.Conv1d(embed, embed, 1, bias=False)
        self.queries = nn.Conv1d(embed, embed, 1, bias=False)
        self.fc_out = nn.Linear(embed, embed)

    def forward(self, x):
        n, t, e = x.shape
        xc = x.permute(0, 2, 1)
        v = self.values(xc).permute(0, 2, 1).reshape(n, t, self.h, self.d)
        k = self.keys(xc).permute(0, 2, 1).reshape(n, t, self.h, self.d)
        q = self.queries(xc).permute(0, 2, 1).reshape(n, t, self.h, self.d)
        energy = torch.einsum("nqhd,nkhd->nhqk", q, k)
        attn = torch.softmax(energy / math.sqrt(self.d), dim=3)
        out = torch.einsum("nhql,nlhd->nqhd", attn, v).reshape(n, t, e)
        return self.fc_out(out)


class ResBlockT(nn.Module):
    def __init__(self, L, domain, G, U, k=3, dilation=1, bias=True, bn="BN"):
        super().__init__()
        pad = ((k - 1) * dilation) // 2
        self.bn = bn
        self.conv1_filter = conv_for(domain, L, G, k, pad, dilation, bias)
        self.conv1_gate = conv_for(domain, L, G, k, pad, dilation, bias)
        if bn == "BN":
            self.batch_filter1 = nn.BatchNorm1d(L)
            self.batch_filter2 = nn.BatchNorm1d(G)
            self.batch_gate2 = nn.BatchNorm1d(G)
        self.conv2_skip = conv_for(domain, G, U, 1, 0, 1, bias)
        self.conv2_residual = conv_for(domain, G, L, 1, 0, 1, bias)

    def forward(self, x):
        if self.bn == "BN":
            x = torch.tanh(self.batch_filter1(x))
            y = torch.tanh(self.batch_filter2(self.conv1_filter(x))) * torch.sigmoid(
                self.batch_gate2(self.conv1_gate(x))
            )
        else:
            y = torch.tanh(self.conv1_filter(x)) * torch.sigmoid(self.conv1_gate(x))
        return x + self.conv2_residual(y), self.conv2_skip(y)


class TCBlockT(nn.Module):
    def __init__(self, L, domain, G, U, V, vk, pool, dilations, bias, bn, pool_time="TCN"):
        super().__init__()
        self.ResBlocks = nn.ModuleList(
            [ResBlockT(L, domain, G, U, 3, d, bias, bn) for d in dilations]
        )
        self.pool = pool
        self.pool_time = pool_time
        self.conv1 = conv_for(domain, U, V[0], vk, 1, 1, bias)
        self.attention = MHAT(V[0], 8)
        self.conv2 = conv_for(domain, V[0], V[1], vk, 1, 1, bias)

    def forward(self, x):
        skip_sum = None
        for blk in self.ResBlocks:
            x, skip = blk(x)
            skip_sum = skip if skip_sum is None else skip_sum + skip
        out = F.relu(skip_sum)
        if self.pool_time == "TCN":
            out = F.max_pool1d(out, self.pool[0][1])
        out = self.conv1(out)
        out = self.attention(out.permute(0, 2, 1)).permute(0, 2, 1)
        out = F.relu(out)
        if self.pool_time == "TCN":
            out = F.max_pool1d(out, self.pool[1][1])
        out = self.conv2(out)
        out = torch.tanh(out)
        if self.pool_time == "TCN":
            out = F.max_pool1d(out, self.pool[2][1])
        return out


class ConvTCBlockT(nn.Module):
    def __init__(self, freq, cin, domain, filters, pool, G, U, V, vk, dilations, bias, bn,
                 pool_time="TCN"):
        super().__init__()
        blocks = []
        c_prev = cin
        for c in filters:
            mods = [conv_for(domain, c_prev, c, 3, 1, 1, bias, ndim=2)]
            if bn == "BN":
                mods.append(nn.BatchNorm2d(c))
            blocks.append(nn.Sequential(*mods))
            c_prev = c
        self.cnn = nn.Sequential(*blocks)
        if pool_time == "CNN":
            self.pools = [(p[0], p[1]) for p in pool]
        else:
            self.pools = [(p[0], 1) for p in pool]
        L = freq // (pool[0][0] * pool[1][0] * pool[2][0]) * filters[-1]
        self.tcn = TCBlockT(L, domain, G, U, V, vk, pool, dilations, bias, bn,
                            pool_time=pool_time)

    def forward(self, x):
        for i, blk in enumerate(self.cnn):
            x = F.max_pool2d(F.relu(blk(x)), self.pools[i])
        b = x.shape[0]
        x = x.permute(0, 3, 1, 2).reshape(b, x.shape[3], -1).permute(0, 2, 1)
        x = self.tcn(x)
        return x.permute(0, 2, 1)


class SELDModelT(nn.Module):
    """Eval-mode reference model mirror (single trunk or 2Parallel)."""

    def __init__(self, freq, cin, domain, domain_classifier, filters, pool, G, U, V,
                 vk, dilations, fc_layers, classes=14, overlaps=3, bias_conv=False,
                 bias_linear=True, bn="BN", parallel=False, magphase=False,
                 pool_time="TCN", fc_activations="linear"):
        super().__init__()
        self.parallel, self.magphase, self.cin = parallel, magphase, cin
        cdom = domain if domain_classifier == "same" else domain_classifier
        if parallel:
            self.branch_A = ConvTCBlockT(freq, cin // 2, domain, filters, pool, G, U, V, vk, dilations, bias_conv, bn, pool_time)
            self.branch_B = ConvTCBlockT(freq, cin // 2, domain, filters, pool, G, U, V, vk, dilations, bias_conv, bn, pool_time)
            fc_in = V[-1] * 2
        else:
            self.seld_block = ConvTCBlockT(freq, cin, domain, filters, pool, G, U, V, vk, dilations, bias_conv, bn, pool_time)
            fc_in = V[-1]
        sed_out = classes * overlaps
        sed_list, doa_list = [], []
        for width in fc_layers:
            sed_list.append(linear_for(cdom, fc_in, width, bias_linear))
            doa_list.append(linear_for(cdom, fc_in, width, bias_linear))
            if fc_activations in {"relu", "ReLU", "RELU"}:
                sed_list.append(nn.ReLU())
                doa_list.append(nn.ReLU())
            fc_in = width
        self.sed = nn.Sequential(*sed_list, nn.Linear(fc_layers[-1], sed_out, bias=bias_linear))
        self.doa = nn.Sequential(*doa_list, nn.Linear(fc_layers[-1], sed_out * 3, bias=bias_linear))

    def forward(self, x):
        if self.parallel:
            if self.magphase:
                xa = torch.cat((x[:, :4], x[:, 8:12]), 1)
                xb = torch.cat((x[:, 4:8], x[:, 12:]), 1)
            else:
                xa = x[:, : self.cin // 2]
                xb = x[:, self.cin // 2 :]
            h = torch.cat((self.branch_A(xa), self.branch_B(xb)), 2)
        else:
            h = self.seld_block(x)
        return torch.sigmoid(self.sed(h)), torch.tanh(self.doa(h))
