#!/bin/bash
# Headline Cityscapes->Foggy run (parity with the reference train.sh: learnable
# anchors + EFL + tau [0.5, 0.5]).

python train_net.py \
     --config-file configs/pt/final_c2f.yaml \
      MODEL.ANCHOR_GENERATOR.NAME "DifferentiableAnchorGenerator" \
      UNSUPNET.EFL True \
      UNSUPNET.EFL_LAMBDA "[0.5,0.5]" \
      UNSUPNET.TAU "[0.5,0.5]"
