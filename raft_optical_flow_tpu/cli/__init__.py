"""L5 command-line drivers, replacing the reference's root-level scripts.

  python -m raft_optical_flow_tpu.cli.train_raft   ~= train.py + train_standard.sh
  python -m raft_optical_flow_tpu.cli.train_flow   ~= train_liteflownet3[_unsupervised].py,
                                                      train_simple_flow[_unsupervised].py,
                                                      IFNET_train.py
  python -m raft_optical_flow_tpu.cli.evaluate     ~= evaluate.py / evaluate_liteflownet3.py
  python -m raft_optical_flow_tpu.cli.demo         ~= demo.py / demo_simple_flow.py /
                                                      liteflownet3_demo.py
"""
