"""Numerical verification of the TransNet TF1-checkpoint conversion.

Builds a TF graph with the reference's exact variable naming
(``transnetv1_handler.py:25-83``: ``TransNet/SDDCNN_{l}/DDCNN_{s}/
Conv3D_{d}/{kernel,bias}``, ``TransNet/dense``, ``TransNet/dense_1``) and
op semantics (temporally dilated SAME conv3d + relu, 1x2x2 max pool, dense
relu, dense softmax[..., 1]), saves a REAL TF checkpoint bundle with
``tf.compat.v1.train.Saver``, converts it with ``tools/convert_transnet.py``,
and checks the flax model reproduces the TF forward on random input.

This exercises all three failure surfaces of the conversion: the checkpoint
bundle reader, the name mapping, and the layout/semantics assumptions
(DHWIO kernels, dilation placement, SAME padding).
"""

import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

pytestmark = pytest.mark.slow

F, L, S, D = 2, 3, 2, 16   # tiny variant; names depend only on L/S/dilations


def _build_tf_forward(tf1, x):
    """The reference graph's forward with explicit variables."""
    net = tf.cast(x, tf.float32) / 255.0
    for idx_l in range(L):
        filters = (2 ** idx_l) * F
        with tf1.variable_scope(f'SDDCNN_{idx_l + 1}'):
            for idx_s in range(S):
                with tf1.variable_scope(f'DDCNN_{idx_s + 1}'):
                    outs = []
                    for d in (1, 2, 4, 8):
                        with tf1.variable_scope(f'Conv3D_{d}'):
                            in_ch = int(net.shape[-1])
                            k = tf1.get_variable(
                                'kernel', [3, 3, 3, in_ch, filters],
                                initializer=tf1.glorot_uniform_initializer(
                                    seed=d + 10 * idx_s + 100 * idx_l))
                            b = tf1.get_variable(
                                'bias', [filters],
                                initializer=tf1.random_normal_initializer(
                                    0.0, 0.1, seed=d))
                        y = tf.nn.conv3d(net, k, strides=[1] * 5,
                                         padding='SAME',
                                         dilations=[1, d, 1, 1, 1])
                        outs.append(tf.nn.relu(y + b))
                    net = tf.concat(outs, axis=4)
            net = tf.nn.max_pool3d(net, ksize=[1, 1, 2, 2, 1],
                                   strides=[1, 1, 2, 2, 1], padding='VALID')
    shape = [tf.shape(net)[0], tf.shape(net)[1],
             int(np.prod(net.shape[2:]))]
    net = tf.reshape(net, shape)
    with tf1.variable_scope('dense'):
        k1 = tf1.get_variable('kernel', [int(net.shape[-1]), D],
                              initializer=tf1.glorot_uniform_initializer(
                                  seed=7))
        b1 = tf1.get_variable('bias', [D],
                              initializer=tf1.zeros_initializer())
    net = tf.nn.relu(tf.matmul(net, k1) + b1)
    with tf1.variable_scope('dense_1'):
        k2 = tf1.get_variable('kernel', [D, 2],
                              initializer=tf1.glorot_uniform_initializer(
                                  seed=8))
        b2 = tf1.get_variable('bias', [2],
                              initializer=tf1.zeros_initializer())
    logits = tf.matmul(net, k2) + b2
    return tf.nn.softmax(logits)[:, :, 1]


def test_checkpoint_conversion_reproduces_tf_forward(tmp_path):
    tf1 = tf.compat.v1
    tf1.disable_eager_execution()

    graph = tf1.Graph()
    with graph.as_default():
        x = tf1.placeholder(tf.uint8, [None, None, 27, 48, 3])
        with tf1.variable_scope('TransNet'):
            probs = _build_tf_forward(tf1, x)
        saver = tf1.train.Saver()
        init = tf1.global_variables_initializer()

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 12, 27, 48, 3)).astype(np.uint8)

    ckpt = str(tmp_path / 'transnet_model-test')
    with tf1.Session(graph=graph) as sess:
        sess.run(init)
        tf_probs = sess.run(probs, feed_dict={x: frames})
        saver.save(sess, ckpt)

    out_pkl = str(tmp_path / 'converted.pkl')
    res = subprocess.run(
        [sys.executable, 'tools/convert_transnet.py', ckpt, out_pkl],
        capture_output=True, text=True, cwd='/root/repo')
    assert res.returncode == 0, res.stderr

    import pickle

    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1

    with open(out_pkl, 'rb') as fp:
        variables = pickle.load(fp)
    model = TransNetV1(f=F, l=L, s=S, d=D)
    jax_probs = np.asarray(model.apply(variables, jnp.asarray(frames)))

    assert jax_probs.shape == tf_probs.shape
    np.testing.assert_allclose(jax_probs, tf_probs, rtol=1e-4, atol=1e-5)
