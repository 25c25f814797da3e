from envgs_tpu.cli import main

main()
