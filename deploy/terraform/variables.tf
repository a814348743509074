# Variables (reference deploy/terraform/variables.tf shape).

variable "project_id" {
  type        = string
  description = "GCP project."
}

variable "region" {
  type        = string
  default     = "us-west4" # v5e availability
  description = "Deployment region; pick one with TPU v5e quota."
}

variable "name_prefix" {
  type    = string
  default = "pfa"
}

variable "cpu_node_count" {
  type    = number
  default = 1
}

variable "tpu_machine_type" {
  type        = string
  default     = "ct5lp-hightpu-4t"
  description = "TPU VM machine type (4-chip v5e host by default)."
}

variable "tpu_min_nodes" {
  type    = number
  default = 1
}

variable "tpu_max_nodes" {
  type    = number
  default = 4
}
