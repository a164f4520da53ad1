"""Independent NumPy oracles mirroring the reference TF1 math.

These are deliberately written in the *reference's* formulation (pad/crop,
per-pixel gathers, TF1 resize index rules — see /root/reference/modules.py,
losses.py) so the JAX ops, which use a different shift/slice formulation,
are checked against an independent derivation.
"""

from __future__ import annotations

import numpy as np


def leaky_relu(x, alpha):
    return np.where(x >= 0, x, alpha * x)


# ---------------------------------------------------------------- resize
def tf1_resize_bilinear(x, out_h, out_w):
    """NHWC bilinear resize, TF1 align_corners=False semantics."""
    in_h, in_w = x.shape[-3], x.shape[-2]
    ys = np.arange(out_h, dtype=np.float32) * (
        np.float32(in_h) / np.float32(out_h)
    )
    xs = np.arange(out_w, dtype=np.float32) * (
        np.float32(in_w) / np.float32(out_w)
    )
    y0 = np.floor(ys).astype(np.int64)
    y1 = np.minimum(np.ceil(ys), in_h - 1).astype(np.int64)
    wy = (ys - y0).astype(np.float32)
    x0 = np.floor(xs).astype(np.int64)
    x1 = np.minimum(np.ceil(xs), in_w - 1).astype(np.int64)
    wx = (xs - x0).astype(np.float32)

    top = x[..., y0, :, :]
    bot = x[..., y1, :, :]
    tl, tr = top[..., x0, :], top[..., x1, :]
    bl, br = bot[..., x0, :], bot[..., x1, :]
    wy = wy[:, None, None]
    wx = wx[:, None]
    t = tl + (tr - tl) * wx
    b = bl + (br - bl) * wx
    return t + (b - t) * wy


def tf1_resize_nearest(x, out_h, out_w):
    in_h, in_w = x.shape[-3], x.shape[-2]
    ys = np.minimum(
        np.floor(
            np.arange(out_h, dtype=np.float32)
            * (np.float32(in_h) / np.float32(out_h))
        ),
        in_h - 1,
    ).astype(np.int64)
    xs = np.minimum(
        np.floor(
            np.arange(out_w, dtype=np.float32)
            * (np.float32(in_w) / np.float32(out_w))
        ),
        in_w - 1,
    ).astype(np.int64)
    return x[..., ys, :, :][..., xs, :]


# ------------------------------------------------------------------ warp
def nearest_warp(x, flow):
    """Per-pixel gather oracle of modules.py:83-97."""
    b, h, w, c = x.shape
    out = np.zeros_like(x)
    fi = flow.astype(np.int32)  # trunc toward zero, like tf.cast
    for bi in range(b):
        for y in range(h):
            for xx in range(w):
                ty = np.clip(y + fi[bi, y, xx, 1], 0, h - 1)
                tx = np.clip(xx + fi[bi, y, xx, 0], 0, w - 1)
                out[bi, y, xx] = x[bi, ty, tx]
    return out


def bilinear_warp(x, flow):
    """Per-pixel 4-corner oracle of modules.py:99-137."""
    b, h, w, c = x.shape
    out = np.zeros_like(x, dtype=np.float32)
    for bi in range(b):
        for y in range(h):
            for xx in range(w):
                fx, fy = flow[bi, y, xx, 0], flow[bi, y, xx, 1]
                fx0, fy0 = np.floor(fx), np.floor(fy)
                fx1, fy1 = fx0 + 1, fy0 + 1
                gx0 = int(np.clip(xx + fx0, 0, w - 1))
                gx1 = int(np.clip(xx + fx1, 0, w - 1))
                gy0 = int(np.clip(y + fy0, 0, h - 1))
                gy1 = int(np.clip(y + fy1, 0, h - 1))
                c00 = (fy1 - fy) * (fx1 - fx)
                c01 = (fy1 - fy) * (fx - fx0)
                c10 = (fy - fy0) * (fx1 - fx)
                c11 = (fy - fy0) * (fx - fx0)
                out[bi, y, xx] = (
                    c00 * x[bi, gy0, gx0]
                    + c01 * x[bi, gy0, gx1]
                    + c10 * x[bi, gy1, gx0]
                    + c11 * x[bi, gy1, gx1]
                )
    return out


# ----------------------------------------------------------- cost volume
def cost_volume(f0, f1, d=4, activate=True):
    """Pad/multiply/crop oracle of modules.py:158-204."""
    b, h, w, c = f0.shape
    costs = []
    for v in range(-d, d + 1):
        for u in range(-d, d + 1):
            vt, vb = max(v, 0), abs(min(v, 0))
            hl, hr = max(u, 0), abs(min(u, 0))
            f0p = np.pad(f0, ((0, 0), (vt, vb), (hl, hr), (0, 0)))
            f1p = np.pad(f1, ((0, 0), (vb, vt), (hr, hl), (0, 0)))
            prod = f0p * f1p
            ph, pw = prod.shape[1], prod.shape[2]
            cropped = prod[:, vt : ph - vb, hl : pw - hr, :]
            costs.append(cropped.mean(axis=3))
    cv = np.stack(costs, axis=3)
    if activate:
        cv = leaky_relu(cv, 0.1)
    return cv


# ---------------------------------------------------------------- losses
def l1_loss(x, y):
    return np.mean(np.sum(np.sum(np.abs(x - y), axis=3), axis=(1, 2)))


def l2_loss(x, y):
    return np.mean(
        np.sum(np.sqrt(np.sum((x - y) ** 2, axis=3)), axis=(1, 2))
    )


def epe(gt, flow):
    return np.mean(np.sqrt(np.sum((gt - flow) ** 2, axis=3)))


def multiscale_loss(flows_gt, flows_pyramid, weights):
    gt_scaled = flows_gt / 20.0
    total = 0.0
    for wgt, fs in zip(weights, flows_pyramid):
        h, w = fs.shape[1], fs.shape[2]
        gt_down = tf1_resize_nearest(gt_scaled, h, w)
        total += wgt * l2_loss(gt_down, fs)
    return total


def multirobust_loss(flows_gt, flows_pyramid, weights, epsilon=0.01, q=0.4):
    gt_scaled = flows_gt / 20.0
    total = 0.0
    for wgt, fs in zip(weights, flows_pyramid):
        h, w = fs.shape[1], fs.shape[2]
        gt_down = tf1_resize_nearest(gt_scaled, h, w)
        lvl = l1_loss(gt_down, fs)
        total += wgt * (lvl + epsilon) ** q
    return total


# ---------------------------------------------------- full-model oracle
def conv2d_same(x, kernel, bias, stride=1, dilation=1):
    """NHWC x HWIO 'SAME' conv, TF semantics (pad bottom/right heavier)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    eff_kh = kh + (kh - 1) * (dilation - 1)
    eff_kw = kw + (kw - 1) * (dilation - 1)
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max((out_h - 1) * stride + eff_kh - h, 0)
    pad_w = max((out_w - 1) * stride + eff_kw - w, 0)
    pt, pb = pad_h // 2, pad_h - pad_h // 2
    pl_, pr = pad_w // 2, pad_w - pad_w // 2
    xp = np.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    out = np.zeros((b, out_h, out_w, cout), np.float32)
    for oy in range(out_h):
        for ox in range(out_w):
            acc = np.zeros((b, cout), np.float32)
            for ky in range(kh):
                for kx in range(kw):
                    iy = oy * stride + ky * dilation
                    ix = ox * stride + kx * dilation
                    patch = xp[:, iy, ix, :]  # (b, cin)
                    acc += patch @ kernel[ky, kx]  # (b, cout)
            out[:, oy, ox, :] = acc + bias
    return out


def _conv_seq(params, prefix, x, specs):
    """Run a sequence of convs named conv2d, conv2d_1, ... with LeakyReLU."""
    for i, (stride, dilation, act, alpha) in enumerate(specs):
        name = "conv2d" if i == 0 else f"conv2d_{i}"
        p = params[prefix][name]
        x = conv2d_same(
            x, np.asarray(p["kernel"]), np.asarray(p["bias"]),
            stride=stride, dilation=dilation,
        )
        if act:
            x = leaky_relu(x, alpha)
    return x


def pwcdcnet_forward(params, images_0, images_1, num_levels=6,
                     search_range=4, output_level=4,
                     filters=(16, 32, 64, 96, 128, 192), use_dc=False):
    """Full PWCDCNet forward in NumPy, mirroring model.py:95-134.

    ``use_dc`` enables the estimator's dense connections exactly as the
    reference does (modules.py:269-272): after each of the 5 hidden convs
    the activated output is concatenated IN FRONT of the running feature
    stack (``concat([conv, features])``), so the flow-head conv sees the
    widened stack. The flow-head kernel input widths change accordingly;
    the checkpoint name tree does not.
    """

    def extract(images):
        pyramid = []
        x = images
        idx = 0
        for lvl in range(num_levels):
            for stride in (2, 1, 1):
                name = "conv2d" if idx == 0 else f"conv2d_{idx}"
                p = params["fp_extractor"][name]
                x = conv2d_same(
                    x, np.asarray(p["kernel"]), np.asarray(p["bias"]),
                    stride=stride,
                )
                x = leaky_relu(x, 0.1)
                idx += 1
            pyramid.append(x)
        return pyramid[::-1]

    def estimator(lvl, cv, f0, flows_up, features_up, is_output):
        feats = cv
        for extra in (f0, flows_up, features_up):
            if extra is not None:
                feats = np.concatenate([feats, extra], axis=3)
        est = params[f"optflow_{lvl}"]
        for i in range(5):
            name = "conv2d" if i == 0 else f"conv2d_{i}"
            p = est[name]
            conv = leaky_relu(
                conv2d_same(feats, np.asarray(p["kernel"]),
                            np.asarray(p["bias"])), 0.1)
            # dense connection: conv output first (modules.py:269-272)
            feats = (np.concatenate([conv, feats], axis=3)
                     if use_dc else conv)
        p = est["conv2d_5"]
        flows = conv2d_same(feats, np.asarray(p["kernel"]),
                            np.asarray(p["bias"]))
        if flows_up is not None:
            flows = flows + flows_up
        if is_output:
            return flows, feats
        h, w = flows.shape[1] * 2, flows.shape[2] * 2
        return (flows, tf1_resize_bilinear(flows, h, w),
                tf1_resize_bilinear(feats, h, w))

    def context(flows, feats):
        x = np.concatenate([flows, feats], axis=3)
        specs = [(1, d, i < 6, 0.1) for i, d in
                 enumerate([1, 2, 4, 8, 16, 1, 1])]
        x = _conv_seq(params, "context", x, specs)
        return flows + x

    pyramid_0 = extract(images_0)
    pyramid_1 = extract(images_1)
    scales = [None] + [20.0 / 2 ** (num_levels - l)
                       for l in range(1, num_levels + 1)]

    flows_pyramid = []
    flows_up = features_up = None
    for lvl, (f0, f1) in enumerate(zip(pyramid_0, pyramid_1)):
        if lvl == 0:
            f1w = f1
        else:
            f1w = bilinear_warp(f1, flows_up * scales[lvl])
        cv = cost_volume(f0, f1w, d=search_range)
        if lvl < output_level:
            flows, flows_up, features_up = estimator(
                lvl, cv, f0, flows_up, features_up, False)
            flows_pyramid.append(flows)
        else:
            flows, feats = estimator(
                lvl, cv, f0, flows_up, features_up, True)
            flows = context(flows, feats)
            flows_pyramid.append(flows)
            upscale = 2 ** (num_levels - output_level)
            h, w = flows.shape[1] * upscale, flows.shape[2] * upscale
            flows_final = tf1_resize_bilinear(flows, h, w) * 20.0
            return flows_final, flows_pyramid
