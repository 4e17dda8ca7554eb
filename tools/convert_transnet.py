#!/usr/bin/env python3
"""Convert the TransNet V1 TF1 checkpoint to flax params.

The reference loads ``transnet_model-F16_L3_S2_D256`` with a TF1 Saver
(``transnetv1_handler.py:85-89``).  TF checkpoint bundles need tensorflow to
read, which the TPU image does not ship — run this OFFLINE wherever
tensorflow is available:

    python tools/convert_transnet.py transnet_model-F16_L3_S2_D256 out.pkl

then pass ``--transnet-weights out.pkl`` to the CLI.

Variable mapping (TF graph built at ``transnetv1_handler.py:25-83``):
  TransNet/SDDCNN_{l}/DDCNN_{s}/Conv3D_{d}/{kernel,bias}
      -> sddcnn{l}_ddcnn{s}/conv3d_dil{d}/{kernel,bias}
  TransNet/dense/{kernel,bias}      -> dense1
  TransNet/dense_1/{kernel,bias}    -> dense2
TF Conv3D kernels are (kd, kh, kw, in, out) = flax DHWIO; no transpose
needed.  Dense kernels are (in, out) in both.
"""

import pickle
import sys


def tf_variable_names(levels: int = 3, stages: int = 2) -> list:
    """Every TF variable name of the TransNet graph, in a stable order."""
    names = []
    for l in range(1, levels + 1):
        for s in range(1, stages + 1):
            for d in (1, 2, 4, 8):
                base = f'TransNet/SDDCNN_{l}/DDCNN_{s}/Conv3D_{d}'
                names.append(f'{base}/kernel')
                names.append(f'{base}/bias')
    for dense in ('dense', 'dense_1'):
        names.append(f'TransNet/{dense}/kernel')
        names.append(f'TransNet/{dense}/bias')
    return names


def map_variables(get_tensor, levels: int = 3, stages: int = 2) -> dict:
    """TF-name -> flax-tree mapping, independent of the checkpoint reader.

    ``get_tensor(tf_name)`` supplies the arrays (a TF ``CheckpointReader``'s
    bound method, or a plain dict lookup in hermetic tests).
    """
    params = {}

    def put(path, value):
        node = params
        parts = path.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for l in range(1, levels + 1):
        for s in range(1, stages + 1):
            for d in (1, 2, 4, 8):
                base = f'TransNet/SDDCNN_{l}/DDCNN_{s}/Conv3D_{d}'
                dst = f'sddcnn{l}_ddcnn{s}/conv3d_dil{d}'
                put(f'{dst}/kernel', get_tensor(f'{base}/kernel'))
                put(f'{dst}/bias', get_tensor(f'{base}/bias'))
    put('dense1/kernel', get_tensor('TransNet/dense/kernel'))
    put('dense1/bias', get_tensor('TransNet/dense/bias'))
    put('dense2/kernel', get_tensor('TransNet/dense_1/kernel'))
    put('dense2/bias', get_tensor('TransNet/dense_1/bias'))
    return {'params': params}


def convert(checkpoint_path: str, out_path: str) -> None:
    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(checkpoint_path)
    except ImportError:
        try:
            import tensorflow.compat.v1 as tf
            reader = tf.train.NewCheckpointReader(checkpoint_path)
        except ImportError:
            sys.exit('tensorflow is required to read TF checkpoints; run '
                     'this script in an environment that has it')

    names = list(reader.get_variable_to_shape_map())
    variables = map_variables(reader.get_tensor)

    unused = [n for n in names if 'Adam' not in n and 'beta' not in n
              and not n.startswith('TransNet/')]
    if unused:
        print(f'note: unconverted checkpoint variables: {unused}')

    with open(out_path, 'wb') as fp:
        pickle.dump(variables, fp)
    print(f'wrote {out_path}')


if __name__ == '__main__':
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2])
