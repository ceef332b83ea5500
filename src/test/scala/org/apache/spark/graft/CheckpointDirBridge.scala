package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for SparkContext's private[spark] checkpointDir:
  * lets a suite flip the shared test session into reliable-checkpoint
  * mode for one test and restore local mode afterwards (there is no
  * public un-set API). */
object CheckpointDirBridge {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def set(sc: SparkContext, dir: Option[String]): Unit = sc.checkpointDir = dir
}
